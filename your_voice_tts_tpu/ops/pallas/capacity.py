"""Device-derived VMEM capacity arithmetic for the Pallas kernel routers.

Round-2 review: the kernel routing limits (PALLAS_MAX_BATCH=128,
MAX_T_BANDED=256, Griffin-Lim vmem_limit_bytes) were v5e constants baked into
the source — on any other TPU generation they silently mis-route or OOM.
This module derives them from the actual device:

- `vmem_bytes_per_core()` maps jax's device_kind to the per-core VMEM size
  (v2/v3: 16 MiB; v4/v5/v6 families: 128 MiB), falling back to the v5e value
  for unknown kinds.
- `taco2_kernel_fits(...)` does the working-set accounting for the
  weights-in-VMEM Tacotron2 decode kernel (ops/pallas/taco2_decode.py):
  decoder weights + the banded location matrices (2*T^2*A bytes in bf16) +
  per-batch encoder/processed/mask blocks + per-chunk output blocks + state
  scratch, against the device budget. Calibrated against the v5e
  measurements: (T=256, B=128, full model) fits; B=256 measured 134 MB and
  does not.

The kernels themselves still pass an explicit `vmem_limit_bytes` to Mosaic —
derived from the same budget — so a mis-estimate fails loudly at compile
time instead of mis-executing.
"""

from __future__ import annotations

import functools

import jax

MIB = 1024 * 1024

# per-core VMEM by device generation (public TPU system architecture docs;
# the pallas guide's hardware model). Unknown/new kinds fall back to 128 MiB
# (every generation since v4).
_VMEM_BY_KIND = {
    "TPU v2": 16 * MIB,
    "TPU v3": 16 * MIB,
    "TPU v4": 128 * MIB,
    "TPU v4 lite": 128 * MIB,
    "TPU v5": 128 * MIB,
    "TPU v5 lite": 128 * MIB,
    "TPU v5e": 128 * MIB,
    "TPU v5p": 128 * MIB,
    "TPU v6 lite": 128 * MIB,
    "TPU v6e": 128 * MIB,
    "TPU7x": 128 * MIB,
}

DEFAULT_VMEM = 128 * MIB

# Largest T the taco2/taco1 decode kernels serve with the dense BANDED
# location matrices (2*T^2*A bytes bf16 — 32 MB at T=256/A=128). Past this
# the taco2 wrapper auto-routes onto the tiled formulation (constant VMEM in
# T); taco1 falls back to the XLA scan.
MAX_T_BANDED = 256


@functools.lru_cache(maxsize=4)
def vmem_bytes_per_core(device_kind: str | None = None) -> int:
    """Per-core VMEM for `device_kind` (default: the first local device)."""
    if device_kind is None:
        try:
            device_kind = jax.devices()[0].device_kind
        except Exception:
            return DEFAULT_VMEM
    for kind, size in _VMEM_BY_KIND.items():
        if device_kind.startswith(kind):
            return size
    return DEFAULT_VMEM


# Mosaic cannot use every byte of VMEM (compiler-managed double buffering,
# semaphores, alignment padding of non-128 lane dims). Keep the working set
# under this fraction of the physical size. 0.83 reproduces the measured v5e
# routing boundary: full-model T=256/B=128 fits in 128 MiB, B=256 does not.
_USABLE_FRACTION = 0.83


def kernel_vmem_limit(device_kind: str | None = None) -> int:
    """`vmem_limit_bytes` to hand Mosaic: the usable share of physical VMEM."""
    return int(vmem_bytes_per_core(device_kind) * _USABLE_FRACTION)


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def taco2_decode_bytes(*, T: int, B: int, E: int, A: int, H1: int, H2: int,
                       n_mels: int, out_width: int, prenet_dim: int,
                       chunk: int = 50, graves: bool = False,
                       loc_tiled: bool = False, loc_attn: bool = True) -> int:
    """Working-set bytes of the Tacotron2 decode kernel for the given shapes.

    Mirrors tacotron2_decode_pallas's buffer list: bf16 matmul operands,
    f32 biases/scratch/outputs. T is the (unpadded) text length; A and B are
    padded the way the launcher pads them (A to a lane multiple, B to a
    sublane multiple).
    """
    A = _rup(A, 128)
    B = _rup(B, 8)
    Tl = _rup(T, 128)  # Mosaic pads buffers whose LANE dim is T to 128 lanes
    bf2, f4 = 2, 4
    w = 0
    # prenet
    w += (n_mels * prenet_dim + prenet_dim * prenet_dim) * bf2
    # attention rnn (wx [prenet+E, 4H1], wh [H1, 4H1])
    w += ((prenet_dim + E) * 4 * H1 + H1 * 4 * H1) * bf2
    if graves:
        # Graves GMM: l1 [H1, H1] + section-packed l2 [H1, 384]; no banded
        # matrices, no key projection, tiny dummy pinp block
        w += (H1 * H1 + H1 * 384) * bf2 + (128 + 384) * f4
    elif not loc_attn:
        # content-based attention (location_attn=False): q [H1, A], v [A],
        # dummy k_loc [8, 128] — no band, no T cap from location matrices
        w += (H1 * A) * bf2 + 8 * 128 * bf2 + A * f4
    elif loc_tiled:
        # attention projections: q [H1, A], the shift-invariant tile matrix
        # [2*384, 128*A] (constant in T — taco2_decode._tile_matrices), v [A]
        w += (H1 * A) * bf2 + (2 * 384 * 128 * A) * bf2 + A * f4
    else:
        # attention projections: q [H1, A], banded K_loc [2T, T*A], v [A]
        w += (H1 * A) * bf2 + (2 * T * T * A) * bf2 + A * f4
    # decoder rnn (wx [H1+E, 4H2], wh [H2, 4H2])
    w += ((H1 + E) * 4 * H2 + H2 * 4 * H2) * bf2
    # projection [H2+E, out_width] + projection-folded stopnet [H2+E, 1]
    w += ((H2 + E) * out_width + (H2 + E)) * bf2
    # forward-attention shift matrix [T, Tl] + transition agent (always passed)
    w += T * Tl * bf2 + (E + H1) * bf2
    # per-batch inputs: enc_out bf16, processed f32, maskadd f32 (lane = T)
    pinp = 0 if graves else B * T * A * f4
    inputs = B * T * E * bf2 + pinp + B * Tl * f4
    # per-chunk output blocks (dec, align [lane=T], stop), double-buffered
    outputs = 2 * chunk * B * (_rup(out_width, 128) + Tl + 128) * f4
    # state scratch (h1,c1,h2,c2,ctx f32; att/cum/alpha lane-padded; frame,
    # done, win, graves mu) + in/out RNN-state blocks
    halo = 2 * 256 if loc_tiled else 0  # att+cum each gain 2*128 halo lanes
    scratch = B * (2 * H1 + 2 * H2 + E + 3 * Tl + halo + _rup(n_mels, 128)
                   + 256 + 128) * f4
    states = 2 * B * (2 * H1 + 2 * H2 + _rup(n_mels, 128)) * f4
    return w + inputs + outputs + scratch + states


def taco2_route(cfg, *, T: int, B: int, E: int, r_init: int,
                n_mels: int = 80, chunk: int = 50,
                device_kind: str | None = None) -> str | None:
    """Which decode-kernel formulation serves (T, B) on this device:
    'banded' (single band-matrix MXU pass, T <= MAX_T_BANDED), 'tiled'
    (constant-VMEM shift-invariant tile matrix, any T), or None (XLA scan).
    Mirrors tacotron2_decode_pallas's auto-route exactly: banded up to
    MAX_T_BANDED, tiled beyond."""
    graves = getattr(cfg, "attention_type", "original") == "graves"
    loc_attn = bool(getattr(cfg, "location_attn", True))
    loc_tiled = (not graves) and loc_attn and T > MAX_T_BANDED
    need = taco2_decode_bytes(
        T=T if not loc_tiled else _rup(T, 128), B=B, E=E,
        A=cfg.attention_dim, H1=cfg.attention_rnn_dim,
        H2=cfg.decoder_rnn_dim, n_mels=n_mels, out_width=n_mels * r_init,
        prenet_dim=cfg.prenet_dim, chunk=chunk, graves=graves,
        loc_tiled=loc_tiled, loc_attn=loc_attn)
    if need > kernel_vmem_limit(device_kind):
        return None
    return "tiled" if loc_tiled else "banded"


def taco2_kernel_fits(cfg, *, T: int, B: int, E: int, r_init: int,
                      n_mels: int = 80, chunk: int = 50,
                      device_kind: str | None = None) -> bool:
    """True when the decode kernel (either formulation) serves (T, B)."""
    return taco2_route(cfg, T=T, B=B, E=E, r_init=r_init, n_mels=n_mels,
                       chunk=chunk, device_kind=device_kind) is not None


def _taco2_train_common_bytes(*, T: int, B: int, E: int, A: int, H1: int,
                              H2: int, P: int, d: int) -> int:
    """Weights + resident inputs shared by the train fwd/bwd kernels.
    processed_inputs is handed to the kernels in the COMPUTE dtype (the
    energy tanh re-adds it in f32 either way), so it counts at d bytes."""
    A = _rup(A, 128)
    Tl = _rup(T, 128)
    w = ((P + E) * 4 * H1 + H1 * 4 * H1) * d          # attention LSTM
    w += ((H1 + E) * 4 * H2 + H2 * 4 * H2) * d        # decoder LSTM
    w += H1 * A * d + 2 * T * T * A * d + A * 4       # q_w, banded K_loc, v
    w += (4 * H1 + 4 * H2) * 4                        # biases (fwd only; noise)
    resident = B * T * E * d + B * T * A * d + B * Tl * 4
    return w + resident


def taco2_train_fwd_bytes(*, T: int, B: int, E: int, A: int, H1: int,
                          H2: int, P: int, chunk: int, dtype_bytes: int = 2,
                          dropout: bool = True) -> int:
    """Working set of the teacher-forced forward kernel
    (ops/pallas/taco2_train.py taco2_train_fwd_pallas)."""
    d = dtype_bytes
    B = _rup(B, 8)
    Tl = _rup(T, 128)
    Pl = _rup(P, 128)
    base = _taco2_train_common_bytes(T=T, B=B, E=E, A=A, H1=H1, H2=H2,
                                     P=P, d=d)
    ins = chunk * B * (Pl + (H1 + H2 if dropout else 2 * 128)) * d
    outs = chunk * B * ((H2 + E + 4 * H1 + 4 * H2 + H1 + H2) * d + Tl * 4)
    scratch = B * (2 * H1 + 2 * H2 + E) * d + 2 * B * Tl * 4
    # Mosaic stack: per-step energy-block intermediates live in VMEM too —
    # tanh_arg [B, T, A] f32 and the location projection [B, T*A] f32
    # (measured on v5e: omitting these under-counted the bwd kernel by
    # ~21 MB and it OOM'd at the production shape)
    interm = 2 * B * T * A * 4
    return base + 2 * (ins + outs) + scratch + interm


def taco2_train_bwd_bytes(*, T: int, B: int, E: int, A: int, H1: int,
                          H2: int, P: int, chunk: int, dtype_bytes: int = 2,
                          dropout: bool = True) -> int:
    """Working set of the reverse-scan backward kernel
    (ops/pallas/taco2_train.py taco2_train_bwd_pallas)."""
    d = dtype_bytes
    B = _rup(B, 8)
    Tl = _rup(T, 128)
    Pl = _rup(P, 128)
    base = _taco2_train_common_bytes(T=T, B=B, E=E, A=A, H1=H1, H2=H2,
                                     P=P, d=d)
    ins = chunk * B * ((H2 + E + 4 * H1 + 4 * H2 + 2 * H1 + 2 * H2) * d
                       + 3 * Tl * 4
                       + (H1 + H2 if dropout else 2 * 128) * d)
    outs = chunk * B * ((4 * H1 + 4 * H2 + E + Pl) * d + Tl * 4)
    scratch = B * (2 * H1 + 2 * H2 + E) * 4 + 2 * B * Tl * 4
    # Mosaic stack: the backward holds tanh_arg AND d_tanh [B, T, A] f32
    # plus the location projection / its cotangent ([B, T*A] f32 + dtype)
    interm = B * T * A * (3 * 4 + d)
    return base + 2 * (ins + outs) + scratch + interm


def taco2_train_plan(*, T: int, B: int, E: int, A: int, H1: int, H2: int,
                     P: int, dtype_bytes: int = 2, dropout: bool = True,
                     device_kind: str | None = None) -> dict | None:
    """Routing decision for the training kernels: the largest time-chunks in
    {8, 4, 2, 1} whose fwd / bwd working sets fit this device's VMEM, chosen
    INDEPENDENTLY (the backward's per-step intermediates are ~2x the
    forward's, so at the production shape fwd=2 / bwd=1 on v5e), or None
    (-> XLA custom-VJP scan) when either side cannot fit at chunk=1."""
    limit = kernel_vmem_limit(device_kind)
    kw = dict(T=T, B=B, E=E, A=A, H1=H1, H2=H2, P=P,
              dtype_bytes=dtype_bytes, dropout=dropout)

    def pick(bytes_fn):
        for chunk in (8, 4, 2, 1):
            if bytes_fn(chunk=chunk, **kw) <= limit:
                return chunk
        return None

    c_fwd = pick(taco2_train_fwd_bytes)
    c_bwd = pick(taco2_train_bwd_bytes)
    if c_fwd is None or c_bwd is None:
        return None
    return {"chunk_fwd": c_fwd, "chunk_bwd": c_bwd}


def gl_max_tile(n_fft: int, device_kind: str | None = None,
                validated_cap: int = 1024) -> int:
    """Largest frame-tile length the whole-loop Griffin-Lim kernel
    (ops/pallas/griffin_lim.py griffin_lim_pallas_full) serves on this
    device: ~8 VMEM-resident [T, K_freq] f32 buffers + 4 DFT matrices.
    Capped at the hardware-validated 1024 (v5e, err/sig 0.175)."""
    Kf = _rup(n_fft // 2 + 1, 128)
    limit = kernel_vmem_limit(device_kind)
    mats = 4 * Kf * _rup(n_fft, 128) * 4
    per_frame = Kf * 4 * 8
    t = max(0, (limit - mats) // per_frame)
    return min(validated_cap, (t // 8) * 8)


def taco1_kernel_fits(cfg, *, T: int, B: int, E: int, r_init: int,
                      memory_size: int, n_mels: int = 80, chunk: int = 50,
                      device_kind: str | None = None) -> bool:
    """Working-set check for the Tacotron(1) decode kernel
    (ops/pallas/taco1_decode.py): GRU stack of width `tacotron_width`//1,
    banded (T <= MAX_T_BANDED) or tiled (beyond; constant-VMEM) location
    matrices, memory queue — same structure as taco2 but much smaller
    weights. Mirrors tacotron1_decode_pallas's auto-route."""
    A = _rup(cfg.attention_dim, 128)
    Bp = _rup(B, 8)
    loc_tiled = T > MAX_T_BANDED
    if loc_tiled:
        T = _rup(T, 128)   # wrapper pads T to whole 128-lane output tiles
    Tl = _rup(T, 128)
    w = cfg.tacotron_width
    M = memory_size if memory_size > 0 else r_init
    bf2, f4 = 2, 4
    wt = 0
    # prenet (M*n_mels -> w//... actual dims approximated by width w)
    wt += (M * n_mels * w + w * w) * bf2
    # attention GRU + 2 decoder GRUs (3 gates each) + projections
    wt += 3 * ((2 * w) * 3 * w + w * 3 * w) * bf2
    # location matrices: banded [2T, T*A] vs shared tile [2*384, 128*A]
    wt += (w * A) * bf2
    wt += (2 * 384 * 128 * A if loc_tiled else 2 * T * T * A) * bf2
    wt += ((w + E) * w + w * _rup(n_mels * r_init, 128)) * bf2
    inputs = Bp * T * E * bf2 + Bp * T * A * f4 + Bp * Tl * f4
    outputs = 2 * chunk * Bp * (_rup(n_mels * r_init, 128) + Tl + 128) * f4
    halo = 2 * 256 if loc_tiled else 0  # att+cum each gain 2*128 halo lanes
    scratch = Bp * (3 * w + E + 2 * Tl + halo + _rup(M * n_mels, 128)
                    + 128) * f4
    return wt + inputs + outputs + scratch <= kernel_vmem_limit(device_kind)


def taco2_max_T(cfg, *, B: int, E: int, r_init: int, n_mels: int = 80,
                device_kind: str | None = None, hard_cap: int = 1024) -> int:
    """Largest text length (multiple of 32) the kernel serves at batch B."""
    best = 0
    t = 32
    while t <= hard_cap:
        if taco2_kernel_fits(cfg, T=t, B=B, E=E, r_init=r_init,
                             n_mels=n_mels, device_kind=device_kind):
            best = t
        t += 32
    return best


def taco2_max_batch(cfg, *, T: int, E: int, r_init: int, n_mels: int = 80,
                    device_kind: str | None = None, hard_cap: int = 512) -> int:
    """Largest batch (multiple of 8) the kernel serves at text length T."""
    best = 0
    b = 8
    while b <= hard_cap:
        if taco2_kernel_fits(cfg, T=T, B=b, E=E, r_init=r_init,
                             n_mels=n_mels, device_kind=device_kind):
            best = b
        b += 8
    return best
