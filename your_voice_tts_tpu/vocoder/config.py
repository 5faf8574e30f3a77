"""Vocoder configs (reference vocoder/configs/*.json field groups)."""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from ..config import AudioConfig, _build, _strip_json_comments


@dataclass(frozen=True)
class MelganConfig:
    upsample_factors: tuple[int, ...] = (8, 8, 2, 2)   # product == hop_length
    num_res_blocks: int = 3
    base_channels: int = 512
    kernel_size: int = 7
    num_scales: int = 3                                 # discriminator scales
    disc_base_channels: int = 16


@dataclass(frozen=True)
class PWGANConfig:
    upsample_factors: tuple[int, ...] = (4, 4, 4, 4)   # product == hop_length
    num_layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    kernel_size: int = 3
    aux_context_window: int = 0   # reference conv_in context frames/side
    disc_layers: int = 10
    disc_channels: int = 64


@dataclass(frozen=True)
class WaveRNNConfig:
    mode: str = "mulaw"          # "mulaw" (categorical) | "mol" | "gauss"
    bits: int = 10               # mu-law quantization bits
    num_mixtures: int = 10       # MoL components (mode == "mol")
    rnn_dims: int = 512
    fc_dims: int = 512
    compute_dims: int = 128
    res_out_dims: int = 128
    num_res_blocks: int = 10
    pad: int = 2                 # conditioning context frames each side
    upsample_factors: tuple[int, ...] = (4, 8, 8)  # product == hop_length
    # batched folding (reference "batched sequence folding" [B:10]).
    # Round-5 fold-width sweep on v5e (1400-frame mel, 357,888 samples,
    # Pallas kernel): target 11000 -> 206x RT wall, 5500 -> 237x, 2750 ->
    # 211x (per-step cost grows past ~64 folds) — the knee is ~5500.
    # Greedy folded-vs-unfolded seam check: multi-res STFT distance and
    # seam-local RMS are the same at 5500 as at 11000 (0.60 vs 0.67; the
    # divergence is the fold state-reset itself, not the width), so the
    # faster config costs no seam quality (tests/test_vocoder.py seam gate).
    batched: bool = True
    target: int = 5_500          # samples decoded per fold (sweep knee)
    overlap: int = 550           # crossfade overlap between folds


@dataclass(frozen=True)
class VocoderTrainingConfig:
    batch_size: int = 32
    seq_len: int = 8192          # audio samples per training segment
    epochs: int = 10_000
    lr_gen: float = 1e-4
    lr_disc: float = 1e-4
    grad_clip: float = 10.0
    steps_to_start_discriminator: int = 200_000
    use_stft_loss: bool = True
    use_feat_match_loss: bool = True
    stft_loss_weight: float = 0.5
    feat_match_loss_weight: float = 2.5
    print_step: int = 25
    save_step: int = 10_000
    # bf16 compute / f32 master weights. Safe default for WaveRNN (its NLL
    # always evaluates in f32 — see models/wavernn.py loss).
    mixed_precision: bool = True
    # GAN (MelGAN/PWGAN) mixed precision is OPT-IN: adversarial dynamics are
    # sensitive to the conv forwards' precision and the reference recipe is
    # f32. LSGAN + multi-res STFT losses stay f32 regardless either way.
    gan_mixed_precision: bool = False


@dataclass(frozen=True)
class VocoderConfig:
    model: str = "melgan"        # "melgan" | "pwgan" | "wavernn"
    audio: AudioConfig = field(default_factory=AudioConfig)
    melgan: MelganConfig = field(default_factory=MelganConfig)
    pwgan: PWGANConfig = field(default_factory=PWGANConfig)
    wavernn: WaveRNNConfig = field(default_factory=WaveRNNConfig)
    training: VocoderTrainingConfig = field(default_factory=VocoderTrainingConfig)


def load_vocoder_config(path_or_cfg) -> VocoderConfig:
    if isinstance(path_or_cfg, VocoderConfig):
        return path_or_cfg
    with open(path_or_cfg, encoding="utf-8") as f:
        raw = json.loads(_strip_json_comments(f.read()))
    groups = {}
    groups["audio"] = _build(AudioConfig, raw.get("audio", {}), "audio")
    groups["melgan"] = _build(MelganConfig, raw.get("melgan", {}), "melgan")
    groups["pwgan"] = _build(PWGANConfig, raw.get("pwgan", {}), "pwgan")
    groups["wavernn"] = _build(WaveRNNConfig, raw.get("wavernn", {}), "wavernn")
    groups["training"] = _build(VocoderTrainingConfig, raw.get("training", {}), "training")
    return VocoderConfig(model=raw.get("model", "melgan"), **groups)
