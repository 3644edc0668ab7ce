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

import keras_ocr_tpu
from keras_ocr_tpu import tools
from keras_ocr_tpu.data import generation

GOOGLE_FONTS_COMMIT = "f5a08a39d82f661d428007bc10f81f1c1e7d5d8b"
FONTS_BLACKLIST = {
    # Decorative / unreadable families excluded from the training set
    # (the reference maintains a similar 74-family blacklist).
    "adventpro", "barcode", "blackops", "bungee", "butcherman", "codystar",
    "creepster", "eater", "faster", "flavors", "fontdinerswanky", "frijole",
    "gochihand", "kranky", "monofett", "monoton", "nosifer", "pressstart2p",
    "rubikmonoone", "rye", "specialelite", "vast", "zillaslabhighlight",
}


def sha256_bytes(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def collect_fonts(fonts_dir: str, output_zip: str) -> None:
    """Dedup (sha256 + basename) and zip .ttf files under fonts_dir."""
    seen_hashes = set()
    seen_names = set()
    kept = []
    for root, _, files in os.walk(fonts_dir):
        for name in sorted(files):
            if not name.lower().endswith(".ttf"):
                continue
            family = os.path.basename(root).lower()
            if family in FONTS_BLACKLIST:
                continue
            path = os.path.join(root, name)
            with open(path, "rb") as f:
                digest = sha256_bytes(f.read())
            if digest in seen_hashes or name in seen_names:
                continue
            if not generation.font_supports_alphabet(
                path, alphabet="abcdefghijklmnopqrstuvwxyz0123456789"
            ):
                continue
            seen_hashes.add(digest)
            seen_names.add(name)
            kept.append(path)
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
    ys = contour[:, 1]
    xs = contour[:, 0]
    if (xs.max() - xs.min()) * (ys.max() - ys.min()) < 1e6:
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
