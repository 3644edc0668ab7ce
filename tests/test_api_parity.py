"""Guard: every public symbol of the reference package exists here.

The reference module map is SURVEY.md §2a; this test walks the actual
reference sources (/root/reference/keras_ocr) so drift is caught
mechanically. Symbols may be re-exports or TPU-native equivalents — the
contract is that a keras-ocr user finds every name they had.
"""

import ast
import importlib
import os

import pytest

REFERENCE_DIR = "/root/reference/keras_ocr"

MODULES = [
    "tools",
    "detection",
    "recognition",
    "pipeline",
    "evaluation",
    "datasets",
    "data_generation",
    "config",
]


def _reference_symbols(module):
    path = os.path.join(REFERENCE_DIR, module + ".py")
    tree = ast.parse(open(path).read())
    return sorted(
        node.name
        for node in tree.body
        if isinstance(node, (ast.FunctionDef, ast.ClassDef))
        and not node.name.startswith("_")
    )


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference sources not mounted"
)
@pytest.mark.parametrize("module", MODULES)
def test_reference_public_symbols_exist(module):
    ours = importlib.import_module("keras_ocr_tpu." + module)
    missing = [s for s in _reference_symbols(module) if not hasattr(ours, s)]
    assert not missing, f"keras_ocr_tpu.{module} missing reference symbols: {missing}"


def test_swish_matches_definition():
    import numpy as np
    import jax.numpy as jnp

    from keras_ocr_tpu.recognition import swish

    x = jnp.asarray(np.linspace(-3, 3, 7, dtype="float32"))
    expected = np.asarray(x) / (1 + np.exp(-np.asarray(x)))
    np.testing.assert_allclose(np.asarray(swish(x)), expected, rtol=1e-6)


def test_ctc_decoder_contract():
    import numpy as np
    import jax.numpy as jnp

    from keras_ocr_tpu.recognition import CTCDecoder

    # 1 sample, 4 frames, 3 classes (class 2 = blank).
    probs = jnp.asarray(
        np.array(
            [[[0.9, 0.05, 0.05], [0.9, 0.05, 0.05], [0.05, 0.05, 0.9], [0.05, 0.9, 0.05]]],
            dtype="float32",
        )
    )
    out = np.asarray(CTCDecoder()(probs))
    assert out.shape == (1, 4)
    # dedupe "00" -> 0, drop blank, then 1; padded with -1 to input length.
    assert out[0].tolist() == [0, 1, -1, -1]


def test_build_torch_model_twin_runs():
    torch = pytest.importorskip("torch")
    import numpy as np
    import jax
    import jax.numpy as jnp

    from keras_ocr_tpu.detection import build_model, build_torch_model
    from keras_ocr_tpu.weights.torch_twin import variables_to_torch_state_dict

    model, variables = build_model()
    twin = build_torch_model()
    twin.load_state_dict(variables_to_torch_state_dict(variables))
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype("float32")
    with torch.no_grad():
        theirs = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)
