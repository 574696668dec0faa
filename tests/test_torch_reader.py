"""Torch-free checkpoint reader (convert/torch_reader.py) vs torch.load.

Covers the real-checkpoint-bytes risks VERDICT r3 lists for the converter:
fp16/bf16-stored tensors, stride/offset views, SHARED storages, the legacy
(pre-zipfile) serialization format, and operating with torch absent.
"""

import builtins
import os

import numpy as np
import pytest
import torch

from mvdfusion_tpu.convert.torch_reader import read_torch_checkpoint


def _state():
    base = torch.arange(48, dtype=torch.float32).reshape(6, 8)
    shared_a = base[1:4]  # offset view into base's storage
    shared_b = base.t()  # non-contiguous view of the SAME storage
    return {
        "w_fp32": torch.randn(4, 5),
        "w_fp16": torch.randn(3, 7).half(),
        "w_bf16": torch.randn(5, 3).bfloat16(),
        "w_i64": torch.arange(10),
        "w_bool": torch.tensor([True, False, True]),
        "w_noncontig": torch.randn(6, 4).t(),
        "shared_a": shared_a,
        "shared_b": shared_b,
        "scalar": torch.tensor(2.5),
    }


def _assert_matches(got, state):
    assert set(got.keys()) == set(state.keys())
    for k, ref in state.items():
        a = np.asarray(got[k])
        r = ref.detach().to(torch.float32 if ref.dtype == torch.bfloat16 else ref.dtype)
        r = r.numpy()
        assert a.shape == r.shape, (k, a.shape, r.shape)
        np.testing.assert_array_equal(a, r, err_msg=k)


def test_zipfile_format(tmp_path):
    state = _state()
    p = os.path.join(tmp_path, "ckpt.pt")
    torch.save(state, p)
    got = read_torch_checkpoint(p)
    _assert_matches(got, state)


def test_zipfile_nested_dict(tmp_path):
    state = _state()
    p = os.path.join(tmp_path, "ckpt.pt")
    torch.save({"model_state_dict": state, "global_step": 7}, p)
    got = read_torch_checkpoint(p)
    assert got["global_step"] == 7
    _assert_matches(got["model_state_dict"], state)


def test_legacy_format(tmp_path):
    state = _state()
    p = os.path.join(tmp_path, "legacy.pt")
    torch.save(state, p, _use_new_zipfile_serialization=False)
    got = read_torch_checkpoint(p)
    _assert_matches(got, state)


def test_torchscript_archive_reads_state_dict(tmp_path):
    """torch.jit.save archives (the CLIP artifact's on-disk form,
    encoders/modules.py:414) parse to the exact state_dict torch.jit.load
    reports — keys, shapes, and bytes."""
    mod = torch.jit.script(
        torch.nn.Sequential(
            torch.nn.Linear(3, 4), torch.nn.LayerNorm(4), torch.nn.Linear(4, 2)
        )
    )
    p = os.path.join(tmp_path, "scripted.pt")
    torch.jit.save(mod, p)
    got = read_torch_checkpoint(p)
    ref = {k: v.numpy() for k, v in torch.jit.load(p).state_dict().items()}
    assert set(got) == set(ref), (sorted(got), sorted(ref))
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]), ref[k], err_msg=k)


def test_torchscript_clip_tower_end_to_end_without_torch(tmp_path, monkeypatch):
    """VERDICT r4 #7: the CLIP checkpoint converts with NO torch install.
    A traced CLIP-visual-shaped module (tests/torch_ref.CLIPVisual under a
    `visual` attribute, matching the OpenAI archive layout) round-trips
    through load_torch_state with torch imports blocked, then lands in the
    flax tower via clip_mapping."""
    from tests import torch_ref
    from mvdfusion_tpu.convert import torch_to_flax

    class Wrapper(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.visual = torch_ref.randomize_(
                torch_ref.CLIPVisual(width=32, layers=2, heads=4, output_dim=16),
                std=0.04, seed=3,
            )

        def forward(self, x):
            return self.visual(x)

    mod = Wrapper().eval()
    with torch.no_grad():
        traced = torch.jit.trace(mod, torch.randn(1, 3, 224, 224))
    p = os.path.join(tmp_path, "clip_like.pt")
    torch.jit.save(traced, p)
    ref = {k: v.numpy() for k, v in torch.jit.load(p).state_dict().items()}

    real_import = builtins.__import__

    def no_torch(name, *a, **kw):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch intentionally unavailable")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    got = torch_to_flax.load_torch_state(p)
    monkeypatch.setattr(builtins, "__import__", real_import)
    assert set(got) == set(ref), (sorted(got)[:5], sorted(ref)[:5])
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)
    assert any(k.startswith("visual.") for k in got)


def test_load_torch_state_without_torch(tmp_path, monkeypatch):
    """load_torch_state must work when `import torch` fails (SURVEY §7.2:
    conversion on a torch-less TPU host)."""
    from mvdfusion_tpu.convert import torch_to_flax

    state = _state()
    p = os.path.join(tmp_path, "ckpt.pt")
    torch.save({"state_dict": state}, p)

    real_import = builtins.__import__

    def no_torch(name, *a, **kw):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch intentionally unavailable")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    got = torch_to_flax.load_torch_state(p)
    monkeypatch.setattr(builtins, "__import__", real_import)
    _assert_matches(got, state)
    # values are plain numpy after _to_numpy_state
    assert all(isinstance(v, np.ndarray) for v in got.values())
