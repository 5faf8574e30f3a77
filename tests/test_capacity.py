"""Device-derived Pallas routing limits (ops/pallas/capacity.py).

Round-2 review: v5e constants (PALLAS_MAX_BATCH=128, MAX_T_BANDED=256, GL
vmem 64MB) were hard-coded; these tests pin the replacement arithmetic to
the measured v5e routing boundary and check it degrades sanely on
small-VMEM generations (v2/v3: 16 MiB).
"""

import numpy as np
import pytest

from your_voice_tts_tpu.config import ModelConfig
from your_voice_tts_tpu.ops.pallas import capacity as cap

FULL = ModelConfig(r=2)  # production dims: A=128, H=1024, prenet 256


def test_vmem_map():
    assert cap.vmem_bytes_per_core("TPU v3") == 16 * cap.MIB
    assert cap.vmem_bytes_per_core("TPU v2") == 16 * cap.MIB
    assert cap.vmem_bytes_per_core("TPU v5 lite") == 128 * cap.MIB
    assert cap.vmem_bytes_per_core("TPU v4") == 128 * cap.MIB
    # unknown / future generations fall back to the 128 MiB default
    assert cap.vmem_bytes_per_core("TPU v9 hyper") == cap.DEFAULT_VMEM


def test_taco2_v5e_known_boundary():
    """Calibration anchors from round-2 hardware measurements (bench.py runs
    at T~=80/B=128 full model; B=256 measured 134 MB and OOMs v5e)."""
    kind = "TPU v5 lite"
    fits = lambda T, B: cap.taco2_kernel_fits(  # noqa: E731
        FULL, T=T, B=B, E=512, r_init=2, n_mels=80, device_kind=kind)
    assert fits(80, 128)      # the round-2 headline bench shape
    assert fits(192, 8)       # the trained-latency kernel path
    assert not fits(80, 256)  # measured 134 MB > v5e VMEM
    # v2/v3 cores (16 MiB) cannot hold the full model's weights at all
    assert not cap.taco2_kernel_fits(FULL, T=80, B=8, E=512, r_init=2,
                                     n_mels=80, device_kind="TPU v3")


def test_taco2_fits_monotonic():
    """Growing T or B must never flip an unsupported shape to supported."""
    kind = "TPU v5 lite"
    prev = True
    for B in (8, 32, 64, 128, 256, 384):
        ok = cap.taco2_kernel_fits(FULL, T=128, B=B, E=512, r_init=2,
                                   n_mels=80, device_kind=kind)
        assert prev or not ok  # once False, stays False
        prev = ok
    prev = True
    for T in (32, 64, 128, 192, 256):
        ok = cap.taco2_kernel_fits(FULL, T=T, B=128, E=512, r_init=2,
                                   n_mels=80, device_kind=kind)
        assert prev or not ok
        prev = ok


def test_taco2_max_helpers_agree_with_fits():
    kind = "TPU v5 lite"
    bmax = cap.taco2_max_batch(FULL, T=96, E=512, r_init=2, device_kind=kind)
    assert bmax >= 64
    assert cap.taco2_kernel_fits(FULL, T=96, B=bmax, E=512, r_init=2,
                                 device_kind=kind)
    assert not cap.taco2_kernel_fits(FULL, T=96, B=bmax + 8, E=512, r_init=2,
                                     device_kind=kind)
    tmax = cap.taco2_max_T(FULL, B=8, E=512, r_init=2, device_kind=kind)
    assert tmax >= 192  # the serving bucket the bench validated


def test_taco1_fits_small_model_generous():
    """The Tacotron(1) stack is ~10x smaller; a v5e must serve generous
    shapes, and v3 should still manage small ones."""
    cfg = ModelConfig(model="Tacotron", r=2)
    assert cap.taco1_kernel_fits(cfg, T=128, B=64, E=256, r_init=2,
                                 memory_size=5, device_kind="TPU v5 lite")
    assert not cap.taco1_kernel_fits(cfg, T=256, B=512, E=256, r_init=2,
                                     memory_size=5, device_kind="TPU v3")


def test_taco2_route_tiled_lifts_t_cap():
    """Past MAX_T_BANDED the router serves the tiled formulation instead of
    falling back to the scan: long texts stay on the kernel fast path, with
    VMEM constant in T (only per-batch buffers grow)."""
    kind = "TPU v5 lite"
    route = lambda T, B: cap.taco2_route(  # noqa: E731
        FULL, T=T, B=B, E=512, r_init=2, n_mels=80, device_kind=kind)
    assert route(192, 8) == "banded"
    assert route(80, 128) == "banded"  # the round-2 headline bench shape
    assert route(512, 8) == "tiled"
    assert route(1024, 8) == "tiled"
    assert route(512, 32) == "tiled"
    # tiled still respects the device budget: enormous B*T buffers spill
    assert route(1024, 512) is None
    # v3's 16 MiB cannot hold the weights at all, in either formulation
    assert cap.taco2_route(FULL, T=512, B=8, E=512, r_init=2,
                           device_kind="TPU v3") is None


def test_taco1_graves_not_claimed_by_kernel():
    """supported_config admits Graves for the Tacotron2 kernel; the
    Tacotron(1) kernel has no Graves branch and must refuse it."""
    from your_voice_tts_tpu.ops.pallas.taco1_decode import taco1_supported

    assert taco1_supported(ModelConfig(model="Tacotron", r=2),
                           memory_size=5, r=2)
    assert not taco1_supported(
        ModelConfig(model="Tacotron", r=2, attention_type="graves"),
        memory_size=5, r=2)


def test_gl_max_tile():
    # v5e: the validated 1024-frame cap holds
    assert cap.gl_max_tile(1024, device_kind="TPU v5 lite") == 1024
    # v3 (16 MiB): a reduced but usable tile, multiple of 8
    t3 = cap.gl_max_tile(1024, device_kind="TPU v3")
    assert 0 < t3 < 1024 and t3 % 8 == 0


def test_routing_uses_device_arithmetic(monkeypatch):
    """models.Tacotron2.pallas_decode_supported consults the capacity
    formula, not a constant: a tiny fake VMEM must reject what a big one
    accepts (backend forced to 'tpu' for the check)."""
    import jax

    from your_voice_tts_tpu.models.tacotron2 import Tacotron2

    model = Tacotron2(30, FULL, n_mels=80)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(cap, "vmem_bytes_per_core",
                        lambda kind=None: 128 * cap.MIB)
    assert model.pallas_decode_supported(96, 64)
    monkeypatch.setattr(cap, "vmem_bytes_per_core",
                        lambda kind=None: 16 * cap.MIB)
    assert not model.pallas_decode_supported(96, 64)
