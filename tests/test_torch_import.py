"""Torch-checkpoint importer gates (utils/torch_import.py).

Builds a torch replica of the reference Tacotron2 architecture — module and
parameter names reconstructed from the upstream mozilla/TTS layer naming
(layers/tacotron2.py), the same provenance as SURVEY.md §0 — random-inits it,
exports its state_dict, imports through convert_tacotron2_state_dict, and
checks FORWARD PARITY between the torch replica and our JAX model on the
imported weights: encoder, two teacher-forced decoder steps (covers prenet,
both LSTMs, location attention, projection, stopnet), and postnet. If every
component agrees numerically, a trained reference checkpoint transfers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from your_voice_tts_tpu.config import ModelConfig
from your_voice_tts_tpu.models.tacotron2 import Tacotron2
from your_voice_tts_tpu.utils.torch_import import (
    convert_tacotron2_state_dict, strip_module_prefix)

N_MELS, N_CHARS = 20, 30
CFG = dict(r=2, embedding_dim=32, encoder_dim=32, decoder_rnn_dim=48,
           attention_rnn_dim=48, attention_dim=24,
           attention_location_filters=8, attention_location_kernel_size=15,
           prenet_dim=24, postnet_dim=32, max_decoder_steps=8,
           prenet_dropout=False)


# --- torch replica with reference module naming ---------------------------

class Linear(tnn.Module):
    """Reference common_layers.Linear wrapper: weights live under
    ``<name>.linear_layer.weight``."""

    def __init__(self, i, o, bias=True):
        super().__init__()
        self.linear_layer = tnn.Linear(i, o, bias=bias)

    def forward(self, x):
        return self.linear_layer(x)


class ConvBNBlock(tnn.Module):
    def __init__(self, i, o, k, activation):
        super().__init__()
        self.convolution1d = tnn.Conv1d(i, o, k, padding=(k - 1) // 2)
        self.batch_normalization = tnn.BatchNorm1d(o)
        self.activation = activation

    def forward(self, x):  # [B, C, T]
        x = self.batch_normalization(self.convolution1d(x))
        if self.activation == "relu":
            x = torch.relu(x)
        elif self.activation == "tanh":
            x = torch.tanh(x)
        return x


class Encoder(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.convolutions = tnn.ModuleList(
            [ConvBNBlock(dim, dim, 5, "relu") for _ in range(3)])
        self.lstm = tnn.LSTM(dim, dim // 2, batch_first=True,
                             bidirectional=True)

    def forward(self, x):  # [B, T, C]
        y = x.transpose(1, 2)
        for c in self.convolutions:
            y = c(y)
        return self.lstm(y.transpose(1, 2))[0]


class LocationLayer(tnn.Module):
    def __init__(self, filters, kernel, attn_dim):
        super().__init__()
        self.location_conv1d = tnn.Conv1d(2, filters, kernel, bias=False,
                                          padding=(kernel - 1) // 2)
        self.location_dense = Linear(filters, attn_dim, bias=False)

    def forward(self, cat):  # [B, 2, T]
        return self.location_dense(self.location_conv1d(cat).transpose(1, 2))


class Attention(tnn.Module):
    def __init__(self, q, e, a, filters, kernel):
        super().__init__()
        self.query_layer = Linear(q, a, bias=False)
        self.inputs_layer = Linear(e, a, bias=False)
        self.v = Linear(a, 1)
        self.location_layer = LocationLayer(filters, kernel, a)

    def forward(self, query, inputs, pinp, att, cum):
        loc = self.location_layer(torch.stack([att, cum], dim=1))
        e = self.v(torch.tanh(self.query_layer(query)[:, None] + loc
                              + pinp))[..., 0]
        sig = torch.sigmoid(e)                       # sigmoid norm, no mask
        align = sig / sig.sum(dim=-1, keepdim=True)
        return torch.bmm(align[:, None, :], inputs)[:, 0], align


class Prenet(tnn.Module):
    def __init__(self, i, p):
        super().__init__()
        self.linear_layers = tnn.ModuleList([Linear(i, p), Linear(p, p)])

    def forward(self, x):  # dropout off: parity run
        for l in self.linear_layers:
            x = torch.relu(l(x))
        return x


class Decoder(tnn.Module):
    def __init__(self, e, n_mels, r, h1, h2, a, p, filters, kernel):
        super().__init__()
        self.prenet = Prenet(n_mels, p)
        self.attention_rnn = tnn.LSTMCell(p + e, h1)
        self.attention = Attention(h1, e, a, filters, kernel)
        self.decoder_rnn = tnn.LSTMCell(h1 + e, h2)
        self.linear_projection = Linear(h2 + e, n_mels * r)
        self.stopnet = tnn.Sequential(tnn.Dropout(0.1),
                                      Linear(h2 + n_mels * r, 1))
        self.e, self.n_mels, self.r = e, n_mels, r

    def forward(self, inputs, mels):
        """Teacher-forced decode over T_mel//r steps (reference decode()
        order: prenet -> attention LSTM -> attention -> decoder LSTM ->
        projection -> stopnet on [h2, full projection])."""
        B, T, _ = inputs.shape
        pinp = self.attention.inputs_layer(inputs)
        memories = torch.cat([torch.zeros(B, 1, self.n_mels),
                              mels[:, self.r - 1:: self.r][:, :-1]], dim=1)
        h1 = c1 = inputs.new_zeros(B, self.attention_rnn.hidden_size)
        h2 = c2 = inputs.new_zeros(B, self.decoder_rnn.hidden_size)
        ctx = inputs.new_zeros(B, self.e)
        att = inputs.new_zeros(B, T)
        cum = inputs.new_zeros(B, T)
        outs, aligns, stops = [], [], []
        for t in range(memories.shape[1]):
            x = self.prenet(memories[:, t])
            h1, c1 = self.attention_rnn(torch.cat([x, ctx], dim=-1), (h1, c1))
            ctx, att = self.attention(h1, inputs, pinp, att, cum)
            cum = cum + att
            h2, c2 = self.decoder_rnn(torch.cat([h1, ctx], dim=-1), (h2, c2))
            out = self.linear_projection(torch.cat([h2, ctx], dim=-1))
            stop = self.stopnet[1](torch.cat([h2, out], dim=-1))
            outs.append(out), aligns.append(att), stops.append(stop[..., 0])
        return (torch.stack(outs, 1), torch.stack(aligns, 1),
                torch.stack(stops, 1))


class Postnet(tnn.Module):
    def __init__(self, n_mels, dim):
        super().__init__()
        chans = [n_mels] + [dim] * 4 + [n_mels]
        acts = ["tanh"] * 4 + [None]
        self.convolutions = tnn.ModuleList(
            [ConvBNBlock(chans[i], chans[i + 1], 5, acts[i])
             for i in range(5)])

    def forward(self, x):  # [B, T, n_mels]
        y = x.transpose(1, 2)
        for c in self.convolutions:
            y = c(y)
        return y.transpose(1, 2)


class TorchTacotron2(tnn.Module):
    def __init__(self, n_chars=N_CHARS):
        super().__init__()
        c = CFG
        self.embedding = tnn.Embedding(n_chars, c["embedding_dim"])
        self.encoder = Encoder(c["encoder_dim"])
        self.decoder = Decoder(c["encoder_dim"], N_MELS, c["r"],
                               c["attention_rnn_dim"], c["decoder_rnn_dim"],
                               c["attention_dim"],
                               c["prenet_dim"],
                               c["attention_location_filters"],
                               c["attention_location_kernel_size"])
        self.postnet = Postnet(N_MELS, c["postnet_dim"])


@pytest.fixture(scope="module")
def imported():
    torch.manual_seed(0)
    treplica = TorchTacotron2().eval()
    # make BN running stats non-trivial so their transfer is actually gated
    for mod in treplica.modules():
        if isinstance(mod, tnn.BatchNorm1d):
            mod.running_mean.normal_(0.0, 0.3)
            mod.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy()
          for k, v in strip_module_prefix(treplica.state_dict()).items()}
    model = Tacotron2(N_CHARS, ModelConfig(**CFG), n_mels=N_MELS)
    fresh = model.init(jax.random.PRNGKey(0))
    variables, report = convert_tacotron2_state_dict(sd, fresh)
    return treplica, model, variables, report


def test_all_source_keys_consumed(imported):
    _, _, _, report = imported
    assert report["unused_source_keys"] == [], report["unused_source_keys"]
    assert report["mapped"] > 40


def test_encoder_forward_parity(imported):
    treplica, model, variables, _ = imported
    params, state = variables["params"], variables["state"]
    ids = np.random.default_rng(0).integers(1, N_CHARS, (3, 11))
    with torch.no_grad():
        ty = treplica.encoder(treplica.embedding(torch.from_numpy(ids)))
    x = model.embedding(params["embedding"], jnp.asarray(ids))
    y, _ = model.encoder(params["encoder"], state["encoder"], x,
                         jnp.array([11, 11, 11]), None, train=False)
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), atol=2e-5)


def test_teacher_forced_decoder_parity(imported):
    """Two decode steps: step 2's prenet consumes a real frame from step 1's
    group, so every imported decoder tensor shapes the result."""
    treplica, model, variables, _ = imported
    params, state = variables["params"], variables["state"]
    rng = np.random.default_rng(1)
    B, T = 2, 9
    enc = rng.standard_normal((B, T, CFG["encoder_dim"])).astype(np.float32)
    mels = rng.standard_normal((B, 2 * CFG["r"], N_MELS)).astype(np.float32)
    with torch.no_grad():
        t_out, t_align, t_stop = treplica.decoder(torch.from_numpy(enc),
                                                  torch.from_numpy(mels))
    out, aligns, stops, _ = model.decoder.forward(
        params["decoder"], state["decoder"], jnp.asarray(enc),
        jnp.array([T, T]), jnp.asarray(mels), None, train=False)
    ours = np.asarray(out).reshape(B, 2, CFG["r"] * N_MELS)
    np.testing.assert_allclose(ours, t_out.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(aligns), t_align.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(stops), t_stop.numpy(), atol=3e-5)


def test_import_cli_roundtrip(imported, tmp_path):
    """bin/import_checkpoint: reference-style torch pickle envelope in,
    npz loadable by train.checkpoint.load_checkpoint out, metadata carried."""
    import json

    from your_voice_tts_tpu.text import symbols

    # the CLI sizes the embedding from the symbol set (like the reference);
    # build the source replica with the matching char count
    torch.manual_seed(1)
    treplica = TorchTacotron2(n_chars=len(symbols)).eval()
    src = tmp_path / "ref_ckpt.pth.tar"
    torch.save({"model": treplica.state_dict(), "r": 2, "step": 1234,
                "epoch": 7}, src)
    cfg = {"model": "Tacotron2", **{k: v for k, v in CFG.items()},
           "audio": {"num_mels": N_MELS, "fft_size": 256, "sample_rate": 8000,
                     "hop_length": 64, "win_length": 256, "mel_fmax": None}}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    out = tmp_path / "imported.npz"

    from your_voice_tts_tpu.bin.import_checkpoint import main
    main([str(src), str(cfg_path), str(out)])

    from your_voice_tts_tpu.train.checkpoint import load_checkpoint
    fresh = Tacotron2(len(symbols), ModelConfig(**CFG), n_mels=N_MELS) \
        .init(jax.random.PRNGKey(1))
    params, state, _, meta = load_checkpoint(
        str(out), params=fresh["params"], model_state=fresh["state"],
        opt_state=None, strict=False)
    assert meta["step"] == 1234 and meta["r"] == 2
    w = np.asarray(params["decoder"]["projection"]["w"])
    tw = treplica.decoder.linear_projection.linear_layer.weight.detach().numpy()
    np.testing.assert_allclose(w, tw.T, atol=1e-6)


def test_postnet_forward_parity(imported):
    treplica, model, variables, _ = imported
    params, state = variables["params"], variables["state"]
    x = np.random.default_rng(2).standard_normal((2, 12, N_MELS)) \
        .astype(np.float32)
    with torch.no_grad():
        ty = treplica.postnet(torch.from_numpy(x))
    y, _ = model.postnet(params["postnet"], state["postnet"], jnp.asarray(x),
                         None, train=False)
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), atol=2e-5)


class _Stretch2d(tnn.Module):
    def __init__(self, x_scale):
        super().__init__()
        self.x_scale = x_scale

    def forward(self, x):  # [B, C, H, W] -> [B, C, H, W*scale]
        b, c, h, w = x.size()
        x = x.unsqueeze(-1).repeat(1, 1, 1, 1, self.x_scale)
        return x.view(b, c, h, w * self.x_scale)


class TorchWaveRNN(tnn.Module):
    """Reference WaveRNN replica (vocoder/models/wavernn.py naming):
    MelResNet with BatchNorms, Stretch2d + 1-channel 2D smoothing convs,
    GRU pair with residual connections, 3 FC layers."""

    class ResBlock(tnn.Module):
        def __init__(self, d):
            super().__init__()
            self.conv1 = tnn.Conv1d(d, d, 1, bias=False)
            self.batch_norm1 = tnn.BatchNorm1d(d)
            self.conv2 = tnn.Conv1d(d, d, 1, bias=False)
            self.batch_norm2 = tnn.BatchNorm1d(d)

        def forward(self, x):
            r = x
            x = torch.relu(self.batch_norm1(self.conv1(x)))
            return self.batch_norm2(self.conv2(x)) + r

    class MelResNet(tnn.Module):
        def __init__(self, n_mels, compute, res_out, blocks, pad):
            super().__init__()
            self.conv_in = tnn.Conv1d(n_mels, compute, 2 * pad + 1, bias=False)
            self.batch_norm = tnn.BatchNorm1d(compute)
            self.layers = tnn.ModuleList(
                [TorchWaveRNN.ResBlock(compute) for _ in range(blocks)])
            self.conv_out = tnn.Conv1d(compute, res_out, 1)

        def forward(self, x):
            x = torch.relu(self.batch_norm(self.conv_in(x)))
            for f in self.layers:
                x = f(x)
            return self.conv_out(x)

    class UpsampleNetwork(tnn.Module):
        def __init__(self, n_mels, factors, compute, res_out, blocks, pad):
            super().__init__()
            self.hop = int(np.prod(factors))
            self.indent = pad * self.hop
            self.resnet = TorchWaveRNN.MelResNet(n_mels, compute, res_out,
                                                 blocks, pad)
            self.resnet_stretch = _Stretch2d(self.hop)
            ups = []
            for f in factors:
                ups.append(_Stretch2d(f))
                c2 = tnn.Conv2d(1, 1, (1, 2 * f + 1), padding=(0, f),
                                bias=False)
                torch.nn.init.normal_(c2.weight)   # random: gate the mapping
                ups.append(c2)
            self.up_layers = tnn.ModuleList(ups)

        def forward(self, m):  # [B, M, T]
            aux = self.resnet(m).unsqueeze(1)
            aux = self.resnet_stretch(aux).squeeze(1)
            m = m.unsqueeze(1)
            for f in self.up_layers:
                m = f(m)
            m = m.squeeze(1)[:, :, self.indent:-self.indent]
            return m.transpose(1, 2), aux.transpose(1, 2)

    def __init__(self, n_mels=20, bits=9, rnn_dims=32, fc_dims=32,
                 compute=32, res_out=16, blocks=2, pad=2, factors=(4, 4)):
        super().__init__()
        self.aux_dims = res_out // 4
        self.upsample = self.UpsampleNetwork(n_mels, factors, compute,
                                             res_out, blocks, pad)
        self.I = tnn.Linear(n_mels + self.aux_dims + 1, rnn_dims)
        self.rnn1 = tnn.GRU(rnn_dims, rnn_dims, batch_first=True)
        self.rnn2 = tnn.GRU(rnn_dims + self.aux_dims, rnn_dims,
                            batch_first=True)
        self.fc1 = tnn.Linear(rnn_dims + self.aux_dims, fc_dims)
        self.fc2 = tnn.Linear(fc_dims + self.aux_dims, fc_dims)
        self.fc3 = tnn.Linear(fc_dims, 2 ** bits)

    def forward(self, x, mels):  # x [B, L] float; mels [B, M, T]
        mels, aux = self.upsample(mels)
        d = self.aux_dims
        a1, a2, a3, a4 = (aux[:, :, i * d:(i + 1) * d] for i in range(4))
        x = torch.cat([x.unsqueeze(-1), mels, a1], dim=2)
        x = self.I(x)
        res = x
        x, _ = self.rnn1(x)
        x = x + res
        res = x
        x, _ = self.rnn2(torch.cat([x, a2], dim=2))
        x = x + res
        x = torch.relu(self.fc1(torch.cat([x, a3], dim=2)))
        x = torch.relu(self.fc2(torch.cat([x, a4], dim=2)))
        return self.fc3(x)


def test_wavernn_import_forward_parity():
    """Reference WaveRNN -> convert (BN folds, diagonal smoothing expand,
    GRU bias pairs) -> teacher-forced logits match at every step."""
    from your_voice_tts_tpu.utils.torch_import import (
        convert_wavernn_state_dict, strip_module_prefix)
    from your_voice_tts_tpu.vocoder.models.wavernn import WaveRNN

    torch.manual_seed(4)
    trep = TorchWaveRNN().eval()
    for mod in trep.modules():
        if isinstance(mod, tnn.BatchNorm1d):
            mod.running_mean.normal_(0.0, 0.3)
            mod.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy()
          for k, v in strip_module_prefix(trep.state_dict()).items()}

    model = WaveRNN(n_mels=20, bits=9, rnn_dims=32, fc_dims=32,
                    compute_dims=32, res_out_dims=16, num_res_blocks=2,
                    pad=2, upsample_factors=(4, 4))
    params = model.init(jax.random.PRNGKey(0))
    params, report = convert_wavernn_state_dict(sd, params)
    assert report["unused_source_keys"] == [], report["unused_source_keys"]

    rng = np.random.default_rng(5)
    mels = rng.standard_normal((2, 8, 20)).astype(np.float32)
    L = (8 - 2 * 2) * 16
    x = rng.uniform(-1, 1, (2, L)).astype(np.float32)
    with torch.no_grad():
        t_logits = trep(torch.from_numpy(x),
                        torch.from_numpy(mels.transpose(0, 2, 1))).numpy()
    logits = np.asarray(model.forward(params, jnp.asarray(x),
                                      jnp.asarray(mels)))
    np.testing.assert_allclose(logits, t_logits, atol=5e-5)


def _wn(mod):
    return torch.nn.utils.weight_norm(mod)


class TorchResStack(tnn.Module):
    """Reference vocoder/layers/melgan.py ResidualStack: LeakyReLU +
    ReflectionPad + weight-normed dilated conv + LeakyReLU + 1x1, with a
    learned weight-normed 1x1 shortcut per block."""

    def __init__(self, ch, n, k=3):
        super().__init__()
        self.blocks = tnn.ModuleList([
            tnn.Sequential(
                tnn.LeakyReLU(0.2),
                tnn.ReflectionPad1d(((k - 1) // 2) * k ** i),
                _wn(tnn.Conv1d(ch, ch, k, dilation=k ** i)),
                tnn.LeakyReLU(0.2),
                _wn(tnn.Conv1d(ch, ch, 1)))
            for i in range(n)])
        self.shortcuts = tnn.ModuleList(
            [_wn(tnn.Conv1d(ch, ch, 1)) for _ in range(n)])

    def forward(self, x):
        for block, shortcut in zip(self.blocks, self.shortcuts):
            x = shortcut(x) + block(x)
        return x


class TorchMelGAN(tnn.Module):
    """Reference melgan_generator.py replica: one Sequential of pad +
    weight-normed convs + per-factor (LeakyReLU, ConvTranspose, ResStack)."""

    def __init__(self, n_mels=20, base=64, factors=(4, 4), blocks=2, k=7):
        super().__init__()
        layers = [tnn.ReflectionPad1d((k - 1) // 2),
                  _wn(tnn.Conv1d(n_mels, base, k))]
        ch = base
        for u in factors:
            layers += [tnn.LeakyReLU(0.2),
                       _wn(tnn.ConvTranspose1d(ch, ch // 2, 2 * u, u,
                                               padding=u // 2 + u % 2,
                                               output_padding=u % 2))]
            layers += [TorchResStack(ch // 2, blocks, 3)]
            ch //= 2
        layers += [tnn.LeakyReLU(0.2), tnn.ReflectionPad1d((k - 1) // 2),
                   _wn(tnn.Conv1d(ch, 1, k)), tnn.Tanh()]
        self.layers = tnn.Sequential(*layers)

    def forward(self, m):  # [B, M, T]
        return self.layers(m)


def test_melgan_import_forward_parity():
    """Reference MelGAN generator -> convert (weight_norm folds, flipped
    transposed-conv kernels, conv shortcuts, reflection pads) -> generated
    audio matches elementwise."""
    from your_voice_tts_tpu.utils.torch_import import (
        convert_melgan_state_dict, strip_module_prefix)
    from your_voice_tts_tpu.vocoder.models.melgan import MelganGenerator

    torch.manual_seed(6)
    trep = TorchMelGAN().eval()
    sd = {k: v.detach().numpy()
          for k, v in strip_module_prefix(trep.state_dict()).items()}

    model = MelganGenerator(n_mels=20, upsample_factors=(4, 4),
                            base_channels=64, num_res_blocks=2, kernel_size=7)
    params = model.init(jax.random.PRNGKey(0))
    params, report = convert_melgan_state_dict(sd, params)
    assert report["unused_source_keys"] == [], report["unused_source_keys"]

    mel = np.random.default_rng(7).standard_normal((2, 11, 20)) \
        .astype(np.float32)
    with torch.no_grad():
        t_wav = trep(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()[:, 0]
    wav = np.asarray(model(params, jnp.asarray(mel)))
    assert wav.shape == t_wav.shape
    np.testing.assert_allclose(wav, t_wav, atol=5e-6)


class TorchSpeakerEncoder(tnn.Module):
    """Reference speaker_encoder/model.py replica: plain LSTM recurring on
    its own hidden, bias-free Linear projection applied to the outputs."""

    class LSTMWithProjection(tnn.Module):
        def __init__(self, i, h, p):
            super().__init__()
            self.lstm = tnn.LSTM(i, h, batch_first=True)
            self.linear = tnn.Linear(h, p, bias=False)

        def forward(self, x):
            return self.linear(self.lstm(x)[0])

    def __init__(self, input_dim=20, proj_dim=16, lstm_dim=24, num_layers=2):
        super().__init__()
        mods, i = [], input_dim
        for _ in range(num_layers):
            mods.append(self.LSTMWithProjection(i, lstm_dim, proj_dim))
            i = proj_dim
        self.layers = tnn.ModuleList(mods)

    def forward(self, x):
        for l in self.layers:
            x = l(x)
        emb = x[:, -1]
        return emb / emb.norm(dim=-1, keepdim=True).clamp_min(1e-8)


def test_speaker_encoder_import_forward_parity(tmp_path):
    """Reference GE2E encoder -> import CLI -> our recur_on_proj=False
    SpeakerEncoder produces the same d-vectors."""
    import json

    from your_voice_tts_tpu.bin.import_checkpoint import main
    from your_voice_tts_tpu.speaker_encoder.model import SpeakerEncoder
    from your_voice_tts_tpu.train.checkpoint import load_checkpoint, read_meta

    torch.manual_seed(2)
    tenc = TorchSpeakerEncoder().eval()
    src = tmp_path / "enc.pth.tar"
    torch.save({"model": tenc.state_dict(), "step": 5}, src)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(
        {"audio": {"num_mels": 20, "fft_size": 256, "sample_rate": 8000,
                   "hop_length": 64, "win_length": 256, "mel_fmax": None}}))
    out = tmp_path / "enc.npz"
    main([str(src), str(cfg_path), str(out), "--kind", "speaker_encoder"])

    arch = read_meta(str(out))["speaker_encoder"]
    assert arch == {"input_dim": 20, "lstm_dim": 24, "proj_dim": 16,
                    "num_layers": 2, "recur_on_proj": False}
    enc = SpeakerEncoder(**arch)
    params = enc.init(jax.random.PRNGKey(0))
    params, _, _, _ = load_checkpoint(str(out), params=params, model_state={},
                                      opt_state=None)
    mels = np.random.default_rng(3).standard_normal((3, 25, 20)) \
        .astype(np.float32)
    with torch.no_grad():
        t_emb = tenc(torch.from_numpy(mels)).numpy()
    emb = np.asarray(enc(params, jnp.asarray(mels)))
    np.testing.assert_allclose(emb, t_emb, atol=2e-5)


class TorchPWGANResBlock(tnn.Module):
    """Reference parallel_wavegan ResidualBlock: weight-normed dilated gated
    conv with aux conditioning, 1x1 residual + skip heads."""

    def __init__(self, res_ch, gate_ch, skip_ch, aux_ch, k, dilation):
        super().__init__()
        pad = (k - 1) // 2 * dilation
        self.conv = _wn(tnn.Conv1d(res_ch, gate_ch, k, padding=pad,
                                   dilation=dilation))
        self.conv1x1_aux = _wn(tnn.Conv1d(aux_ch, gate_ch, 1, bias=False))
        self.conv1x1_out = _wn(tnn.Conv1d(gate_ch // 2, res_ch, 1))
        self.conv1x1_skip = _wn(tnn.Conv1d(gate_ch // 2, skip_ch, 1))

    def forward(self, x, c):
        h = self.conv(x) + self.conv1x1_aux(c)
        xa, xb = h.split(h.size(1) // 2, dim=1)
        z = torch.tanh(xa) * torch.sigmoid(xb)
        s = self.conv1x1_skip(z)
        x = (self.conv1x1_out(z) + x) * (0.5 ** 0.5)
        return x, s


class TorchStretch2d(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.f = f

    def forward(self, x):  # [B, 1, C, T]
        return x.repeat_interleave(self.f, dim=3)


class TorchPWGAN(tnn.Module):
    """Reference parallel_wavegan_generator.py replica: first_conv on noise,
    gated residual stack conditioned on the conv-in + stretch/Conv2d
    upsampled aux, ReLU/1x1 output head; weight norm on every conv."""

    def __init__(self, aux=20, layers=6, stacks=2, res=8, gate=16, skip=8,
                 k=3, factors=(4, 4, 4), aux_window=2):
        super().__init__()
        self.aux_window = aux_window
        self.first_conv = _wn(tnn.Conv1d(1, res, 1))
        lps = layers // stacks
        self.conv_layers = tnn.ModuleList([
            TorchPWGANResBlock(res, gate, skip, aux, k, 2 ** (i % lps))
            for i in range(layers)])
        self.last_conv_layers = tnn.ModuleList([
            tnn.ReLU(), _wn(tnn.Conv1d(skip, skip, 1)),
            tnn.ReLU(), _wn(tnn.Conv1d(skip, 1, 1))])

        class Up(tnn.Module):
            def __init__(self):
                super().__init__()
                ups = []
                for f in factors:
                    ups += [TorchStretch2d(f),
                            _wn(tnn.Conv2d(1, 1, (1, 2 * f + 1),
                                           padding=(0, f), bias=False))]
                self.up_layers = tnn.ModuleList(ups)

        class UpsampleNet(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv_in = _wn(tnn.Conv1d(aux, aux, 2 * aux_window + 1,
                                              bias=False))
                self.upsample = Up()

            def forward(self, c):
                c = self.conv_in(c)
                c = c.unsqueeze(1)
                for layer in self.upsample.up_layers:
                    c = layer(c)
                return c.squeeze(1)

        self.upsample_net = UpsampleNet()

    def forward(self, c, z):  # c [B, M, T] mel, z [B, 1, T*hop] noise
        c = torch.nn.functional.pad(
            c, (self.aux_window, self.aux_window), mode="replicate")
        c = self.upsample_net(c)
        x = self.first_conv(z)
        skips = 0.0
        for f in self.conv_layers:
            x, h = f(x, c)
            skips = skips + h
        skips = skips * ((1.0 / len(self.conv_layers)) ** 0.5)
        x = skips
        for f in self.last_conv_layers:
            x = f(x)
        return x


@pytest.mark.parametrize("aux_window", [2, 0])
def test_pwgan_import_forward_parity(aux_window):
    """Reference PWGAN generator -> convert (weight_norm folds, diagonal
    upsample maps, aux context conv) -> same audio for the same noise.
    aux_window=0 exercises the exact fold of the reference's kernel-1
    conv_in into the first upsample conv (our model has no aux conv
    then)."""
    from your_voice_tts_tpu.utils.torch_import import (
        convert_pwgan_state_dict, strip_module_prefix)
    from your_voice_tts_tpu.vocoder.models.pwgan import ParallelWaveganGenerator

    torch.manual_seed(8)
    trep = TorchPWGAN(aux_window=aux_window).eval()
    sd = {k: v.detach().numpy()
          for k, v in strip_module_prefix(trep.state_dict()).items()}

    model = ParallelWaveganGenerator(
        n_mels=20, num_layers=6, stacks=2, residual_ch=8, gate_ch=16,
        skip_ch=8, kernel_size=3, upsample_factors=(4, 4, 4),
        aux_context_window=aux_window)
    params = model.init(jax.random.PRNGKey(0))
    params, report = convert_pwgan_state_dict(sd, params)
    assert report["unused_source_keys"] == [], report["unused_source_keys"]

    rng = np.random.default_rng(9)
    mel = rng.standard_normal((2, 7, 20)).astype(np.float32)
    noise = rng.standard_normal((2, 7 * 64)).astype(np.float32)
    with torch.no_grad():
        t_wav = trep(torch.from_numpy(mel.transpose(0, 2, 1)),
                     torch.from_numpy(noise[:, None])).numpy()[:, 0]
    wav = np.asarray(model(params, jnp.asarray(mel), noise=jnp.asarray(noise)))
    assert wav.shape == t_wav.shape
    np.testing.assert_allclose(wav, t_wav, atol=5e-6)


class TorchGST(tnn.Module):
    """Reference layers/gst_layers.py replica: ReferenceEncoder (6x Conv2d
    stride-2 + BN + GRU summary) and StyleTokenLayer (tanh'd token bank,
    multi-head attention, no output projection)."""

    def __init__(self, n_mels=20, emb=256, heads=4, tokens=10):
        super().__init__()
        filters = [1, 32, 32, 64, 64, 128, 128]

        class Encoder(tnn.Module):
            def __init__(self):
                super().__init__()
                self.convs = tnn.ModuleList([
                    tnn.Conv2d(filters[i], filters[i + 1], 3, 2, 1)
                    for i in range(6)])
                self.bns = tnn.ModuleList(
                    [tnn.BatchNorm2d(f) for f in filters[1:]])
                post = n_mels
                for _ in range(6):
                    post = (post - 3 + 2 * 1) // 2 + 1
                self.recurrence = tnn.GRU(filters[-1] * post, emb // 2,
                                          batch_first=True)

            def forward(self, x):  # [B, T, M]
                B = x.size(0)
                x = x.unsqueeze(1)
                for conv, bn in zip(self.convs, self.bns):
                    x = torch.relu(bn(conv(x)))
                x = x.transpose(1, 2).contiguous().view(B, x.size(2), -1)
                _, h = self.recurrence(x)
                return h.squeeze(0)

        class StyleTokenLayer(tnn.Module):
            def __init__(self):
                super().__init__()
                d = emb // heads
                self.style_tokens = tnn.Parameter(
                    torch.randn(tokens, d) * 0.5)

                class MHA(tnn.Module):
                    def __init__(self):
                        super().__init__()
                        self.W_query = tnn.Linear(emb // 2, emb, bias=False)
                        self.W_key = tnn.Linear(d, emb, bias=False)
                        self.W_value = tnn.Linear(d, emb, bias=False)

                    def forward(self, query, keys):
                        q, k, v = (self.W_query(query), self.W_key(keys),
                                   self.W_value(keys))
                        split = emb // heads
                        q = torch.stack(q.split(split, dim=2), dim=0)
                        k = torch.stack(k.split(split, dim=2), dim=0)
                        v = torch.stack(v.split(split, dim=2), dim=0)
                        scores = torch.softmax(
                            torch.matmul(q, k.transpose(2, 3)) / (d ** 0.5),
                            dim=3)
                        out = torch.matmul(scores, v)
                        return torch.cat(out.split(1, dim=0),
                                         dim=3).squeeze(0)

                self.attention = MHA()

            def forward(self, prosody):  # [B, emb//2]
                B = prosody.size(0)
                toks = torch.tanh(self.style_tokens)[None].expand(B, -1, -1)
                return self.attention(prosody.unsqueeze(1), toks).squeeze(1)

        self.encoder = Encoder()
        self.style_token_layer = StyleTokenLayer()

    def forward(self, mel):
        return self.style_token_layer(self.encoder(mel))


@pytest.mark.parametrize("n_mels", [20, 80])
def test_gst_import_forward_parity(n_mels):
    """Reference GST -> _convert_gst -> identical style embeddings
    (BN running stats mapped; conv grids aligned via explicit padding;
    GRU input features permuted channel-major -> frequency-major —
    n_mels=80 leaves 2 frequency bins so the permutation is non-trivial)."""
    from your_voice_tts_tpu.config import GSTConfig
    from your_voice_tts_tpu.models.gst import GST
    from your_voice_tts_tpu.utils.torch_import import (_Matcher, _convert_gst,
                                                       strip_module_prefix)

    torch.manual_seed(11)
    trep = TorchGST(n_mels=n_mels).train()
    # burn in non-trivial BN running stats, then freeze for eval parity
    with torch.no_grad():
        for i in range(3):
            trep(torch.randn(4, 23 + i, n_mels))
    trep.eval()
    sd = {"gst_layer." + k: v.detach().numpy()
          for k, v in strip_module_prefix(trep.state_dict()).items()}

    gst = GST(n_mels=n_mels, encoder_dim=256, cfg=GSTConfig())
    gp = gst.init(jax.random.PRNGKey(0))
    gs = gst.init_state()
    m = _Matcher(sd)
    _convert_gst(m, gp, gs)
    assert m.unused() == [], m.unused()

    mel = np.random.default_rng(12).standard_normal((3, 40, n_mels)) \
        .astype(np.float32)
    with torch.no_grad():
        t_style = trep(torch.from_numpy(mel)).numpy()
    style, _ = gst(gp, gs, jnp.asarray(mel), train=False)
    np.testing.assert_allclose(np.asarray(style), t_style, atol=2e-5)


def test_tacotron2_converter_fills_gst_branch():
    """A reference checkpoint carrying gst_layer.* keys fills the GST
    branch of a use_gst Tacotron2 through convert_tacotron2_state_dict
    (full-model wiring of _convert_gst), and the conditioned model stays
    style-sensitive."""
    from your_voice_tts_tpu.config import GSTConfig
    from your_voice_tts_tpu.utils.torch_import import \
        convert_tacotron2_state_dict

    torch.manual_seed(13)
    ttts = TorchTacotron2().eval()
    # emb=256 matches our fixed 128-wide reference-encoder GRU (emb // 2,
    # the reference constraint); the out_proj (256 -> encoder 32) is a
    # config the reference cannot express, so it stays at init by design
    tgst = TorchGST(n_mels=N_MELS, emb=256).eval()
    sd = {k: v.detach().numpy()
          for k, v in strip_module_prefix(ttts.state_dict()).items()}
    sd.update({"gst_layer." + k: v.detach().numpy()
               for k, v in strip_module_prefix(tgst.state_dict()).items()})

    gst_cfg = GSTConfig(gst_embedding_dim=256, gst_num_heads=4)
    model = Tacotron2(N_CHARS, ModelConfig(**CFG), n_mels=N_MELS,
                      use_gst=True, gst_cfg=gst_cfg)
    fresh = model.init(jax.random.PRNGKey(0))
    v, report = convert_tacotron2_state_dict(sd, fresh)
    assert not report["unused_source_keys"], report["unused_source_keys"]
    gst_mismatch = [k for k in report["shape_mismatches"] if "gst" in k]
    assert gst_mismatch == [], gst_mismatch
    for leaf in ("tokens",):
        filled = np.asarray(v["params"]["gst"]["style"][leaf])
        init_t = np.asarray(fresh["params"]["gst"]["style"][leaf])
        assert np.abs(filled - init_t).max() > 1e-6
    gru_f = np.asarray(v["params"]["gst"]["ref"]["gru"]["wx"])
    gru_0 = np.asarray(fresh["params"]["gst"]["ref"]["gru"]["wx"])
    assert np.abs(gru_f - gru_0).max() > 1e-6  # encoder GRU transferred
