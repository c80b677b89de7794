"""Checkpoint / resume round trips (an honest extension — the reference has
no persistence, SURVEY.md §5; main.cpp:177-182 loses state on camera change)."""

import os

import numpy as np
import pytest

import jax

from radish_pt_tpu.config import Settings, Tracer


def _make(cornell, settings=None, mesh=None):
    from radish_pt_tpu.render.renderer import Renderer

    ds, cam, _ = cornell
    return Renderer(ds=ds, cam=cam, desc=None,
                    settings=settings or Settings(trace_depth=3), mesh=mesh)


def test_checkpoint_resume_matches_uninterrupted(cornell, tmp_path):
    """render 4 = render 2 + checkpoint + resume + render 2 (exactly)."""
    a = _make(cornell)
    for _ in range(4):
        a.step()

    b = _make(cornell)
    for _ in range(2):
        b.step()
    path = str(tmp_path / "ck.npz")
    b.save_checkpoint(path)

    c = _make(cornell)
    c.load_checkpoint(path)
    assert c.state.iteration == 2
    for _ in range(2):
        c.step()

    np.testing.assert_allclose(
        np.asarray(a.direct), np.asarray(c.direct), rtol=1e-5, atol=1e-6
    )


def test_checkpoint_restores_split_svgf_history(cornell, tmp_path):
    """svgf_indirect history (split-SVGF, round 2) survives the round trip."""
    a = _make(cornell)
    a.svgf_indirect = a.svgf_indirect.replace(
        accum_color=a.svgf_indirect.accum_color + 0.5
    )
    path = str(tmp_path / "ck.npz")
    a.save_checkpoint(path)
    b = _make(cornell)
    b.load_checkpoint(path)
    np.testing.assert_allclose(
        np.asarray(b.svgf_indirect.accum_color), 0.5, atol=1e-7
    )


@pytest.mark.slow
def test_checkpoint_mesh_mode_roundtrip(cornell, tmp_path):
    """Mesh-mode checkpoint: state gathers on save and re-shards on load."""
    from radish_pt_tpu.parallel import sharding as sh

    devs = jax.devices("cpu")
    if len(devs) < 2:
        pytest.skip("needs virtual devices")
    mesh = sh.make_mesh(n_tile=2, n_sample=1, devices=devs[:2])

    a = _make(cornell, Settings(tracer=Tracer.RESTIR_DI), mesh=mesh)
    a.step()
    a.step()
    path = str(tmp_path / "ck.npz")
    a.save_checkpoint(path)

    b = _make(cornell, Settings(tracer=Tracer.RESTIR_DI), mesh=mesh)
    b.load_checkpoint(path)
    np.testing.assert_allclose(
        np.asarray(a.direct), np.asarray(b.direct), atol=1e-7
    )
    b.step()  # sharded step runs on restored state
    assert b.state.iteration == 3


def test_checkpoint_rejects_mismatched_layout(cornell, tmp_path):
    """Padded-buffer (mesh) and normal-encoding mismatches are rejected
    with a clear error instead of a downstream shape crash."""
    from radish_pt_tpu.parallel import sharding as sh

    devs = jax.devices("cpu")
    # 16x16 over 7 tiles pads 256 -> 259: n_alloc differs from single-device
    mesh = sh.make_mesh(n_tile=7, n_sample=1, devices=devs[:7])
    a = _make(cornell, Settings(tracer=Tracer.RESTIR_DI), mesh=mesh)
    path = str(tmp_path / "mesh.npz")
    a.save_checkpoint(path)
    b = _make(cornell)  # no mesh: unpadded buffers
    with pytest.raises(ValueError, match="mesh tile padding"):
        b.load_checkpoint(path)

    c = _make(cornell)
    p2 = str(tmp_path / "plain.npz")
    c.save_checkpoint(p2)
    d = _make(cornell, Settings(encode_normal=True))
    with pytest.raises(ValueError, match="normal"):
        d.load_checkpoint(p2)


def test_save_hdr_roundtrip(tmp_path, cornell):
    """--out foo.hdr writes raw Radiance RGBE (no tonemap/gamma) that
    read_hdr round-trips to the accumulation within RGBE quantization."""
    from radish_pt_tpu.scene.image_io import read_hdr

    r = _make(cornell)
    r.step()
    path = str(tmp_path / "out.hdr")
    saved = r.save(path)
    img = read_hdr(saved)[:, ::-1]  # undo the save-time X mirror
    ref = np.asarray(r.current_image()).reshape(r.cam.height, r.cam.width, 3)
    assert img.shape == ref.shape
    # RGBE shares one exponent across rgb: ~1% relative error bound
    np.testing.assert_allclose(img, ref, rtol=0.02, atol=1e-3)
