"""Golden low-spp renders per headline config (SURVEY.md §4b: golden-image
integration tests on fixed seeds — the reference verifies visually via its
README gallery, README.md:5-41; these pin the same configs numerically).

First run records the golden (skips); later runs compare mean abs error.
Regenerate by deleting tests/golden/*.npy after an intentional change.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


def _check_golden(name, img):
    assert np.isfinite(img).all()
    path = os.path.join(GOLDEN, f"{name}.npy")
    if not os.path.exists(path):
        os.makedirs(GOLDEN, exist_ok=True)
        np.save(path, img)
        pytest.skip("golden recorded")
    golden = np.load(path)
    assert img.shape == golden.shape
    assert np.abs(img - golden).mean() < 2e-2


def _renderer(scene, settings, res=32):
    from radish_pt_tpu.render.renderer import Renderer
    from radish_pt_tpu.scene.build import load_scene

    ds, cam, desc = load_scene(os.path.join(SCENES, scene))
    return Renderer(
        ds=ds, cam=cam.replace(width=res, height=res), desc=None,
        settings=settings,
    )


def test_golden_cornell_pt():
    """Full-MIS wavefront PT on the Cornell box (BASELINE config 1)."""
    from radish_pt_tpu.config import Settings, Tracer

    r = _renderer("cornell_box.txt", Settings(tracer=Tracer.STREAMED,
                                              trace_depth=4))
    _check_golden("cornell_pt_32", r.render(spp=3))


def test_golden_cornell_restir():
    """ReSTIR DI with temporal+spatial reuse (BASELINE config 5)."""
    from radish_pt_tpu.config import Settings, Tracer

    r = _renderer("cornell_box.txt", Settings(tracer=Tracer.RESTIR_DI))
    _check_golden("cornell_restir_32", r.render(spp=3))


def test_golden_cornell_svgf():
    """Direct tracer + SVGF denoise chain (temporal moments + guided
    wavelet), the denoiser.cu:525-558 pipeline."""
    from radish_pt_tpu.config import Denoiser, Settings, Tracer

    r = _renderer(
        "cornell_box.txt",
        Settings(tracer=Tracer.DIRECT_LIGHT, denoiser=Denoiser.SVGF),
    )
    img = None
    for _ in range(3):
        img = r.step()
    _check_golden("cornell_svgf_32", np.asarray(r.current_image()).reshape(32, 32, 3))


def test_golden_glass():
    """Dielectric scene (BASELINE config 3): refraction + 1/eta^2 scaling."""
    from radish_pt_tpu.config import Settings, Tracer

    r = _renderer("glass.txt", Settings(tracer=Tracer.STREAMED, trace_depth=6))
    _check_golden("glass_32", r.render(spp=3))


@pytest.mark.slow
def test_golden_teapot_hires():
    """>65k-triangle scene end-to-end (the round-1 ceiling, VERDICT
    Missing #1) — tiny res, 1 spp."""
    from radish_pt_tpu.config import Settings, Tracer

    r = _renderer("teapot_hires.txt",
                  Settings(tracer=Tracer.STREAMED, trace_depth=2), res=48)
    _check_golden("teapot_hires_48", r.render(spp=1))
