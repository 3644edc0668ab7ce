"""Build the curated fonts.zip / backgrounds.zip asset sets.

TPU-native analog of /root/reference/scripts/create_fonts_and_backgrounds.py:
fonts come from the Google Fonts repository at a pinned commit (minus a
blacklist and sha256/basename dedup); backgrounds are crawled from the
Wikimedia Featured Pictures API, filtered by aspect ratio, by having a
>=1e6-px uniform contour, and by the CRAFT detector finding NO text in
them (so synthetic text can be composited without label noise).
"""

import argparse
import concurrent.futures
import hashlib
import io
import json
import os
import urllib.request
import zipfile

import numpy as np

import os
import sys

# Make the in-repo package importable when run as `python scripts/<name>.py`
# without a pip install (sys.path[0] is scripts/, not the repo root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import keras_ocr_tpu
from keras_ocr_tpu import tools
from keras_ocr_tpu.data import generation

GOOGLE_FONTS_COMMIT = "f5a08a39d82f661d428007bc10f81f1c1e7d5d8b"
# Exact per-file blacklist reproducing the published fonts.zip: fonts
# found illegible for the English alphabet (thin weights) or rendering
# unexpectedly (barcode/redacted/math faces). This is provenance data and
# must match the reference's list verbatim
# (/root/reference/scripts/create_fonts_and_backgrounds.py:38-114).
FONTS_BLACKLIST = frozenset(
    [
        "AlmendraDisplay-Regular.ttf",
        "RedactedScript-Bold.ttf",
        "RedactedScript-Regular.ttf",
        "Sevillana-Regular.ttf",
        "Mplus1p-Thin.ttf",
        "Stalemate-Regular.ttf",
        "jsMath-cmsy10.ttf",
        "Codystar-Regular.ttf",
        "AdventPro-Thin.ttf",
        "RoundedMplus1c-Thin.ttf",
        "EncodeSans-Thin.ttf",
        "AlegreyaSans-ThinItalic.ttf",
        "AlegreyaSans-Thin.ttf",
        "FiraSans-Thin.ttf",
        "FiraSans-ThinItalic.ttf",
        "WorkSans-Thin.ttf",
        "Tomorrow-ThinItalic.ttf",
        "Tomorrow-Thin.ttf",
        "Italianno-Regular.ttf",
        "IBMPlexSansCondensed-Thin.ttf",
        "IBMPlexSansCondensed-ThinItalic.ttf",
        "Lato-ExtraLightItalic.ttf",
        "LibreBarcode128Text-Regular.ttf",
        "LibreBarcode39-Regular.ttf",
        "LibreBarcode39ExtendedText-Regular.ttf",
        "EncodeSansExpanded-ExtraLight.ttf",
        "Exo-Thin.ttf",
        "Exo-ThinItalic.ttf",
        "DrSugiyama-Regular.ttf",
        "Taviraj-ThinItalic.ttf",
        "SixCaps.ttf",
        "IBMPlexSans-Thin.ttf",
        "IBMPlexSans-ThinItalic.ttf",
        "AdobeBlank-Regular.ttf",
        "FiraSansExtraCondensed-ThinItalic.ttf",
        "HeptaSlab[wght].ttf",
        "Karla-Italic[wght].ttf",
        "Karla[wght].ttf",
        "RalewayDots-Regular.ttf",
        "FiraSansCondensed-ThinItalic.ttf",
        "jsMath-cmex10.ttf",
        "LibreBarcode39Text-Regular.ttf",
        "LibreBarcode39Extended-Regular.ttf",
        "EricaOne-Regular.ttf",
        "ArimaMadurai-Thin.ttf",
        "IBMPlexSerif-ExtraLight.ttf",
        "IBMPlexSerif-ExtraLightItalic.ttf",
        "IBMPlexSerif-ThinItalic.ttf",
        "IBMPlexSerif-Thin.ttf",
        "Exo2-Thin.ttf",
        "Exo2-ThinItalic.ttf",
        "BungeeOutline-Regular.ttf",
        "Redacted-Regular.ttf",
        "JosefinSlab-ThinItalic.ttf",
        "GothicA1-Thin.ttf",
        "Kanit-ThinItalic.ttf",
        "Kanit-Thin.ttf",
        "AlegreyaSansSC-ThinItalic.ttf",
        "AlegreyaSansSC-Thin.ttf",
        "Chathura-Thin.ttf",
        "Blinker-Thin.ttf",
        "Italiana-Regular.ttf",
        "Miama-Regular.ttf",
        "Grenze-ThinItalic.ttf",
        "LeagueScript-Regular.ttf",
        "BigShouldersDisplay-Thin.ttf",
        "YanoneKaffeesatz[wght].ttf",
        "BungeeHairline-Regular.ttf",
        "JosefinSans-Thin.ttf",
        "JosefinSans-ThinItalic.ttf",
        "Monofett.ttf",
        "Raleway-ThinItalic.ttf",
        "Raleway-Thin.ttf",
        "JosefinSansStd-Light.ttf",
        "LibreBarcode128-Regular.ttf",
    ]
)


def sha256_bytes(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def select_fonts(paths, read_bytes=None):
    """Apply the reference's retention rule to an ordered font-file list.

    A file is kept unless its basename is blacklisted, its sha256 was
    already seen, or its basename was already seen (the Google Fonts repo
    duplicates some files across family directories). Returns kept paths
    in input order. ``read_bytes`` is injectable for offline tests.
    """
    if read_bytes is None:

        def read_bytes(path):
            with open(path, "rb") as f:
                return f.read()

    seen_hashes = set()
    seen_names = set()
    kept = []
    for path in paths:
        basename = os.path.basename(path)
        if basename in FONTS_BLACKLIST:
            continue
        digest = sha256_bytes(read_bytes(path))
        if digest in seen_hashes or basename in seen_names:
            continue
        seen_hashes.add(digest)
        seen_names.add(basename)
        kept.append(path)
    return kept


def collect_fonts(fonts_dir: str, output_zip: str) -> None:
    """Blacklist + dedup (sha256, basename) and zip .ttf files under fonts_dir."""
    candidates = []
    for root, _, files in sorted(os.walk(fonts_dir)):
        for name in sorted(files):
            if name.lower().endswith(".ttf"):
                candidates.append(os.path.join(root, name))
    kept = select_fonts(sorted(candidates))
    with zipfile.ZipFile(output_zip, "w") as zfile:
        for path in kept:
            zfile.write(path, os.path.join(*path.split(os.sep)[-2:]))
    print(f"Wrote {len(kept)} fonts to {output_zip}")


def fetch_featured_picture_urls(limit: int):
    """Wikimedia Featured Pictures API crawl."""
    urls = []
    continue_token = ""
    while len(urls) < limit:
        query = (
            "https://commons.wikimedia.org/w/api.php?action=query"
            "&generator=categorymembers&gcmtitle=Category:Featured_pictures_on_Wikimedia_Commons"
            "&gcmtype=file&gcmlimit=50&prop=imageinfo&iiprop=url&format=json"
            + (f"&gcmcontinue={continue_token}" if continue_token else "")
        )
        with urllib.request.urlopen(query) as response:
            payload = json.loads(response.read())
        for page in payload.get("query", {}).get("pages", {}).values():
            for info in page.get("imageinfo", []):
                urls.append(info["url"])
        continue_token = payload.get("continue", {}).get("gcmcontinue")
        if not continue_token:
            break
    return urls[:limit]


def background_is_usable(image: np.ndarray, detector) -> bool:
    """Aspect ratio, uniform-contour area, and no detected text."""
    height, width = image.shape[:2]
    if not 0.5 <= width / height <= 2.0:
        return False
    contour, _ = generation.get_maximum_uniform_contour(image, fontsize=40)
    if contour is None or len(contour) < 3:
        return False
    # Shoelace polygon area — the reference's cv2.contourArea threshold
    # (reference scripts/create_fonts_and_backgrounds.py:213-222).
    xs = np.asarray(contour[:, 0], dtype=np.float64)
    ys = np.asarray(contour[:, 1], dtype=np.float64)
    area = 0.5 * abs(np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1)))
    if area < 1e6:
        return False
    boxes = detector.detect([image])[0]
    return len(boxes) == 0


def collect_backgrounds(output_zip: str, limit: int) -> None:
    detector = keras_ocr_tpu.Detector()
    urls = fetch_featured_picture_urls(limit * 3)
    kept = 0
    with zipfile.ZipFile(output_zip, "w") as zfile:
        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as executor:
            def fetch(url):
                with urllib.request.urlopen(url) as response:
                    return url, response.read()

            for future in concurrent.futures.as_completed(
                [executor.submit(fetch, url) for url in urls]
            ):
                if kept >= limit:
                    break
                try:
                    url, payload = future.result()
                    image = tools.read(io.BytesIO(payload))
                except Exception:  # noqa: BLE001
                    continue
                if not background_is_usable(image, detector):
                    continue
                name = f"{sha256_bytes(payload)[:16]}.jpg"
                zfile.writestr(name, payload)
                kept += 1
    print(f"Wrote {kept} backgrounds to {output_zip}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fonts-dir", help="Checkout of google/fonts at the pinned commit")
    parser.add_argument("--fonts-zip", default="fonts.zip")
    parser.add_argument("--backgrounds-zip", default="backgrounds.zip")
    parser.add_argument("--n-backgrounds", type=int, default=1035)
    parser.add_argument("--skip-fonts", action="store_true")
    parser.add_argument("--skip-backgrounds", action="store_true")
    args = parser.parse_args()
    if not args.skip_fonts:
        assert args.fonts_dir, "--fonts-dir required (git checkout of google/fonts)"
        collect_fonts(args.fonts_dir, args.fonts_zip)
    if not args.skip_backgrounds:
        collect_backgrounds(args.backgrounds_zip, args.n_backgrounds)


if __name__ == "__main__":
    main()
