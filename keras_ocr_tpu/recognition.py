"""Text recognition: CRNN model facade and Recognizer API.

Public surface mirrors the reference ``keras_ocr.recognition``
(/root/reference/keras_ocr/recognition.py:353-545): ``DEFAULT_ALPHABET``,
``DEFAULT_BUILD_PARAMS``, ``Recognizer`` with ``recognize``,
``recognize_from_boxes``, ``get_batch_generator`` — backed by the Flax
CRNN (:mod:`keras_ocr_tpu.models.crnn`) with jitted forward + on-device
CTC greedy decoding (:mod:`keras_ocr_tpu.ops.ctc`). The fused
detection->crop->recognition device path lives in
:mod:`keras_ocr_tpu.pipeline`; the host ``recognize_from_boxes`` here
keeps API parity for standalone use.
"""

from __future__ import annotations

import itertools
import string
import typing

import numpy as np
import jax
import jax.numpy as jnp

from . import tools
from .models.crnn import CRNN, DEFAULT_BUILD_PARAMS
from .ops import ctc as ctc_ops

DEFAULT_ALPHABET = string.digits + string.ascii_lowercase


def _build_pretrained_registry():
    """API parity with recognition.py:27-44's PRETRAINED_WEIGHTS shape."""
    from . import weights as weights_lib

    registry = {}
    for name, entry in weights_lib.RECOGNIZER_PRETRAINED.items():
        registry[name] = {
            "alphabet": DEFAULT_ALPHABET,
            "build_params": DEFAULT_BUILD_PARAMS,
            "weights": entry["weights"],
        }
    return registry


PRETRAINED_WEIGHTS = _build_pretrained_registry()


def build_model(
    alphabet: str,
    height: int = 31,
    width: int = 200,
    color: bool = False,
    filters=(64, 128, 256, 256, 512, 512, 512),
    rnn_units=(128, 128),
    dropout: float = 0.25,
    rnn_steps_to_discard: int = 2,
    pool_size: int = 2,
    stn: bool = True,
) -> CRNN:
    """Build the CRNN graph (parity with recognition.py:187-350).

    The reference returns four Keras models sharing weights (backbone,
    model, training_model, prediction_model); in Flax one module subsumes
    all four — ``apply`` gives softmax probabilities (``model``), the
    training loss/greedy decode are separate jittable ops
    (:mod:`keras_ocr_tpu.ops.ctc`), and backbone-only weight loading is a
    parameter-tree operation (:func:`keras_ocr_tpu.weights.crnn_variables_from_h5`).
    """
    return CRNN(
        alphabet_size=len(alphabet),
        height=height,
        width=width,
        color=color,
        filters=tuple(filters),
        rnn_units=tuple(rnn_units),
        dropout=dropout,
        rnn_steps_to_discard=rnn_steps_to_discard,
        pool_size=pool_size,
        stn=stn,
    )


def rgb_to_grayscale_host(image: np.ndarray) -> np.ndarray:
    """uint8 RGB -> uint8 gray, bit-exact with ``cv2.cvtColor(RGB2GRAY)``.

    OpenCV computes the ITU-R 601 luma in fixed point —
    ``(9798*R + 19235*G + 3735*B + 2**14) >> 15`` (verified exhaustively
    against cv2 on value grids; a float ``np.rint`` differs by one count
    near exact halves). Reproduce the integer math directly.
    """
    rgb = image.astype(np.int64)
    gray = (
        9798 * rgb[..., 0] + 19235 * rgb[..., 1] + 3735 * rgb[..., 2] + (1 << 14)
    ) >> 15
    return gray.astype("uint8")


class Recognizer:
    """CRNN text recognizer with API parity to recognition.py:353-545."""

    def __init__(
        self,
        alphabet: typing.Optional[str] = None,
        weights: typing.Optional[str] = "kurapan",
        build_params: typing.Optional[dict] = None,
        compute_dtype=jnp.float32,
    ):
        from . import config as config_lib
        from . import weights as weights_lib

        config_lib.enable_compile_cache()
        assert alphabet or weights, "At least one of alphabet or weights must be provided."
        if weights is not None:
            build_params = build_params or dict(DEFAULT_BUILD_PARAMS)
            alphabet = alphabet or DEFAULT_ALPHABET
        build_params = dict(build_params or DEFAULT_BUILD_PARAMS)
        if alphabet is None:
            alphabet = DEFAULT_ALPHABET
        self.alphabet = alphabet
        self.blank_label_idx = len(alphabet)
        self.build_params = build_params
        self.model = CRNN(
            alphabet_size=len(alphabet),
            height=build_params["height"],
            width=build_params["width"],
            color=build_params["color"],
            filters=tuple(build_params["filters"]),
            rnn_units=tuple(build_params["rnn_units"]),
            dropout=build_params["dropout"],
            rnn_steps_to_discard=build_params["rnn_steps_to_discard"],
            pool_size=build_params["pool_size"],
            stn=build_params["stn"],
            dtype=compute_dtype,
        )
        channels = 3 if build_params["color"] else 1
        self.input_shape = (build_params["height"], build_params["width"], channels)
        from .models import init_variables

        self.variables = init_variables(self.model, (1,) + self.input_shape)
        if weights is not None:
            pretrained = weights_lib.RECOGNIZER_PRETRAINED[weights]
            if alphabet == DEFAULT_ALPHABET:
                path = weights_lib.download_pretrained(pretrained["weights"]["top"])
                loaded = weights_lib.crnn_variables_from_h5(path, include_top=True)
            else:
                print(
                    "Provided alphabet does not match pretrained alphabet. "
                    "Using backbone weights only."
                )
                path = weights_lib.download_pretrained(pretrained["weights"]["notop"])
                loaded = weights_lib.crnn_variables_from_h5(path, include_top=False)
                # Keep the randomly initialized classification head.
                loaded["params"]["fc_12"] = self.variables["params"]["fc_12"]
            weights_lib.validate_against(loaded, self.variables)
            self.variables = jax.tree.map(jnp.asarray, loaded)
        self._forward = jax.jit(
            lambda variables, x: self.model.apply(variables, x, train=False)
        )

    # -- inference ---------------------------------------------------------

    def _predict_strings(self, crops: np.ndarray) -> typing.List[str]:
        """(N, H, W, C) float crops in [0,1] -> decoded strings."""
        probs = self._forward(self.variables, jnp.asarray(crops))
        decoded = ctc_ops.ctc_greedy_decode(probs)
        return ctc_ops.ctc_decode_to_strings(np.asarray(decoded), self.alphabet)

    def recognize(self, image) -> str:
        """Recognize text in a single pre-cropped image.

        (recognition.py:467-489.)
        """
        height, width, channels = self.input_shape
        image = tools.read_and_fit(
            filepath_or_array=image, width=width, height=height, cval=0
        )
        if channels == 1 and image.shape[-1] == 3:
            image = rgb_to_grayscale_host(image)[..., np.newaxis]
        image = image.astype("float32") / 255
        return self._predict_strings(image[np.newaxis])[0]

    def recognize_from_boxes(
        self, images, box_groups, **kwargs
    ) -> typing.List[typing.List[str]]:
        """Recognize word crops given per-image box groups.

        Host-crop path with API parity to recognition.py:491-537 (all crops
        across all images batched into one device forward). The fully
        fused on-device crop path is used by ``Pipeline.recognize``.

        Extra kwargs mirror the reference's pass-through to Keras
        ``predict``: ``batch_size`` chunks the device forward (bounds
        device memory for huge crop counts), ``verbose`` is accepted and
        ignored; anything else raises.
        """
        batch_size = kwargs.pop("batch_size", None)
        kwargs.pop("verbose", None)
        if kwargs:
            raise TypeError(
                f"Unsupported recognize_from_boxes kwargs: {sorted(kwargs)}"
            )
        assert len(box_groups) == len(
            images
        ), "You must provide the same number of box groups as images."
        height, width, channels = self.input_shape
        crops = []
        start_end: typing.List[typing.Tuple[int, int]] = []
        for image, boxes in zip(images, box_groups):
            image = tools.read(image)
            if channels == 1 and image.shape[-1] == 3:
                image = rgb_to_grayscale_host(image)
            for box in boxes:
                crops.append(
                    tools.warpBox(
                        image=image, box=np.asarray(box, "float32"),
                        target_height=height, target_width=width,
                    )
                )
            start = 0 if not start_end else start_end[-1][1]
            start_end.append((start, start + len(boxes)))
        if not crops:
            return [[]] * len(images)
        X = np.array(crops, dtype="float32") / 255
        if len(X.shape) == 3:
            X = X[..., np.newaxis]
        if batch_size is not None and batch_size < len(X):
            predictions = []
            for i in range(0, len(X), batch_size):
                predictions.extend(self._predict_strings(X[i : i + batch_size]))
        else:
            predictions = self._predict_strings(X)
        return [predictions[start:end] for start, end in start_end]

    def compile(self, optimizer=None, learning_rate: float = 1e-3, mesh=None):
        """Create (and return) the CTC trainer for this recognizer.

        API-parity convenience for the reference's
        ``recognizer.compile()`` + ``training_model.fit`` flow
        (recognition.py:539-545: RMSprop + identity loss over the
        ctc_batch_cost output). Use ``self.trainer.fit(...)`` afterwards.
        """
        import optax

        from .train.recognizer import RecognizerTrainer

        if optimizer is None:
            optimizer = optax.rmsprop(learning_rate)
        self.trainer = RecognizerTrainer(self, optimizer=optimizer, mesh=mesh)
        return self.trainer

    # -- training data -----------------------------------------------------

    def max_string_length(self) -> int:
        """CTC frame count T = W / pool^2 - discarded steps: the longest
        label this model can emit."""
        return int(
            self.build_params["width"] // self.build_params["pool_size"] ** 2
            - self.build_params["rnn_steps_to_discard"]
        )

    def _encode_label(self, sentence: str, pad_to: int) -> typing.List[int]:
        """Alphabet-index a sentence, -1-padded to ``pad_to`` slots.

        Raises on anything the CTC trainer can't digest: characters off
        the alphabet, empty strings, labels longer than the frame count,
        and runs of spaces (the reference enforces the same set,
        recognition.py:440-449).
        """
        if not sentence:
            raise ValueError("Found a zero length sentence.")
        if len(sentence) > pad_to:
            raise ValueError("A sentence is longer than this model can predict.")
        if "  " in sentence:
            raise ValueError(
                "Strings with multiple sequential spaces are not permitted."
            )
        try:
            encoded = [self.alphabet.index(c) for c in sentence]
        except ValueError:
            bad = next(c for c in sentence if c not in self.alphabet)
            raise ValueError(f"Found illegal character: {bad}") from None
        return encoded + [-1] * (pad_to - len(sentence))

    def get_batch_generator(self, image_generator, batch_size=8, lowercase=False):
        """Yield ((images, labels, input_length, label_length), zeros) batches.

        Same data contract as the reference generator
        (recognition.py:406-465); feeds
        :mod:`keras_ocr_tpu.train.recognizer`. Samples are (image, text)
        or (image, text, weight) tuples; a third element adds a
        sample_weights array to the yield.
        """
        frames = self.max_string_length()
        channels = self.input_shape[2]
        ctc_dummy_target = np.zeros((batch_size, 1))
        input_length = np.full((batch_size, 1), frames, dtype="float64")
        while True:
            samples = list(itertools.islice(image_generator, batch_size))
            texts = [sample[1].strip() for sample in samples]
            if lowercase:
                texts = [text.lower() for text in texts]

            planes = []
            for sample in samples:
                image = sample[0]
                if channels != 3:
                    image = rgb_to_grayscale_host(image)[..., np.newaxis]
                planes.append(image.astype("float32") / 255)
            images = np.array(planes)
            labels = np.array([self._encode_label(text, frames) for text in texts])
            label_length = np.array([[len(text)] for text in texts])

            inputs = (images, labels, input_length, label_length)
            if len(samples[0]) == 3:
                weights = np.array([sample[2] for sample in samples])
                yield inputs, ctc_dummy_target, weights
            else:
                yield inputs, ctc_dummy_target


# ---------------------------------------------------------------------------
# Reference-name aliases (recognition.py:47-51,169-184).
# ---------------------------------------------------------------------------
def swish(x, beta=1):
    """x * sigmoid(beta * x) (recognition.py:47-48)."""
    return x * jax.nn.sigmoid(beta * x)


class CTCDecoder:
    """Greedy CTC decode with the reference's -1-padded output contract.

    Functional stand-in for the reference's Lambda layer wrapping
    ``keras.backend.ctc_decode`` (recognition.py:169-184): call with
    (B, T, classes) softmax frames, get (B, T) int32 label indices padded
    with -1 to the input length.
    """

    def __call__(self, y_pred):
        return ctc_ops.ctc_greedy_decode(jnp.asarray(y_pred))
