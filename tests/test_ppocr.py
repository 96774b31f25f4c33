"""PP-OCR recognizer parity vs the reference torch RecModel (eval/ocr_recog)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textflux_tpu.evaluation.ppocr import (
    PPOCRConfig,
    PPOCRRecognizer,
    convert_ppocr_state_dict,
    ctc_greedy_decode,
    init_ppocr_params,
    preprocess_crop,
    recognizer_apply,
)


class AttrDict(dict):
    __getattr__ = dict.__getitem__

    def pop(self, k, *a):
        return dict.pop(self, k, *a)


@pytest.fixture(scope="module")
def oracle_rec(request):
    request.getfixturevalue("torch_oracle")
    import torch

    sys.path.insert(0, "/root/reference/eval")
    from ocr_recog.RecModel import RecModel

    torch.manual_seed(0)
    config = AttrDict(
        in_channels=3,
        backbone=AttrDict(type="MobileNetV1Enhance", scale=0.5,
                          last_conv_stride=[1, 2], last_pool_type="avg"),
        neck=AttrDict(type="SequenceEncoder", encoder_type="svtr", dims=64,
                      depth=2, hidden_dims=120, use_guide=False),
        head=AttrDict(type="CTCHead", fc_decay=1e-5, out_channels=97,
                      return_feats=False),
    )
    return RecModel(config).eval()


def test_forward_parity(oracle_rec, rng):
    import torch

    cfg = PPOCRConfig(n_class=97)
    sd = {k: v.detach().numpy() for k, v in oracle_rec.state_dict().items()}
    params = convert_ppocr_state_dict(sd, cfg)

    x = rng.standard_normal((2, 3, 48, 64)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = oracle_rec(torch.from_numpy(x)).numpy()
    ours = np.asarray(recognizer_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_param_count(oracle_rec):
    cfg = PPOCRConfig(n_class=97)
    sd = {k: v.detach().numpy() for k, v in oracle_rec.state_dict().items()}
    params = convert_ppocr_state_dict(sd, cfg)
    n_ours = sum(int(x.size) for x in jax.tree.leaves(params))
    n_ref = sum(v.numel() for k, v in oracle_rec.state_dict().items()
                if "num_batches_tracked" not in k)
    assert n_ours == n_ref


def test_ctc_decode():
    charset = ["sos", "a", "b", "c", " "]
    t = np.zeros((1, 6, 5), np.float32)
    # a a blank b b c -> "abc"
    for i, idx in enumerate([1, 1, 0, 2, 2, 3]):
        t[0, i, idx] = 5.0
    assert ctc_greedy_decode(t, charset) == ["abc"]


def test_preprocess_crop(rng):
    crop = rng.integers(0, 255, (30, 100, 3), np.uint8)
    out = preprocess_crop(crop)
    assert out.shape == (1, 48, 320, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # right side is zero padding
    assert np.abs(out[0, :, -10:]).max() == 0.0


def test_recognizer_callable(rng):
    cfg = PPOCRConfig(n_class=10)
    params = init_ppocr_params(jax.random.PRNGKey(0), cfg)
    rec = PPOCRRecognizer(params, cfg, ["sos"] + list("abcdefgh") + [" "])
    crop = rng.integers(0, 255, (48, 96, 3), np.uint8)
    out = rec(crop)
    assert isinstance(out, str)


def test_conv1_stride2_padding_parity(oracle_rec, rng):
    """Stride-2 conv over an even input: torch pads symmetrically (k//2);
    XLA "SAME" resolves to a (0,1)-style asymmetric pad that shifts every
    window (measured maxdiff 0.98 here before the fix). The full-model
    parity test is blind to this — random-init activations contract ~10x
    per block — so this stage-level check pins it."""
    import torch

    from textflux_tpu.evaluation.ppocr import _conv_bn

    cfg = PPOCRConfig(n_class=97)
    sd = {k: v.detach().numpy() for k, v in oracle_rec.state_dict().items()}
    params = convert_ppocr_state_dict(sd, cfg)

    x = rng.standard_normal((1, 3, 48, 64)).astype(np.float32)
    with torch.no_grad():
        ref = oracle_rec.backbone.conv1(torch.from_numpy(x)).numpy()
    ours = _conv_bn(params["backbone"]["conv1"],
                    jnp.asarray(x.transpose(0, 2, 3, 1)), stride=(2, 2))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               atol=2e-4, rtol=1e-3)


def test_resize_align_corners_matches_torch(torch_oracle, rng):
    """preprocess_crop's resize must be torch F.interpolate(bilinear,
    align_corners=True) — the reference pre_process — not PIL's antialiased
    half-pixel bilinear."""
    import torch
    import torch.nn.functional as F

    from textflux_tpu.evaluation.ppocr import _resize_bilinear_align_corners

    img = (rng.random((30, 100, 3)) * 255).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(img.transpose(2, 0, 1))[None],
                        size=(48, 160), mode="bilinear",
                        align_corners=True)[0].numpy().transpose(1, 2, 0)
    got = _resize_bilinear_align_corners(img, 48, 160)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-5)


def test_module_level_recognize_entry_point(oracle_rec, tmp_path, monkeypatch):
    """scripts/eval_ocr.sh points eval_ocr at ppocr:recognize — the factory
    must exist, locate weights via PPOCR_* env vars, and return a string."""
    import torch

    import textflux_tpu.evaluation.ppocr as ppocr_mod

    # missing weights -> loud FileNotFoundError naming the env vars
    monkeypatch.setattr(ppocr_mod, "_DEFAULT_RECOGNIZER", None)
    monkeypatch.setenv("PPOCR_CKPT", str(tmp_path / "nope.pth"))
    monkeypatch.setenv("PPOCR_DICT", str(tmp_path / "nope.txt"))
    with pytest.raises(FileNotFoundError, match="PPOCR_CKPT"):
        ppocr_mod.recognize(np.zeros((8, 24, 3), np.uint8))

    # provisioned weights -> lazily builds the recognizer and decodes
    ckpt = tmp_path / "rec.pth"
    torch.save(oracle_rec.state_dict(), str(ckpt))
    cdict = tmp_path / "dict.txt"
    cdict.write_text("\n".join(chr(ord("a") + i) for i in range(95)) + "\n")
    monkeypatch.setenv("PPOCR_CKPT", str(ckpt))
    monkeypatch.setenv("PPOCR_DICT", str(cdict))
    monkeypatch.setenv("PPOCR_LANG", "en")
    crop = (np.random.default_rng(0).random((32, 96, 3)) * 255).astype(np.uint8)
    out = ppocr_mod.recognize(crop)
    assert isinstance(out, str)
    assert ppocr_mod._DEFAULT_RECOGNIZER is not None
    monkeypatch.setattr(ppocr_mod, "_DEFAULT_RECOGNIZER", None)
