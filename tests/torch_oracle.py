"""Torch golden-value oracle, run in a SUBPROCESS.

torch and jax cannot coexist in one process in this environment (OpenMP
runtime conflict causes multi-minute hangs), so every torch-vs-jax parity
test shells out to this script: it computes reference outputs with torch
(and, where relevant, with the reference implementation imported from
/root/reference as a behavioral oracle) and writes them to an .npz file the
jax-side test then loads.

Usage: python tests/torch_oracle.py <job> <in.npz> <out.npz>
"""

import os
import sys
import types

import numpy as np

REFERENCE_ROOT = os.environ.get("TTS_REFERENCE_ROOT", "/root/reference")


def _stub_missing_modules():
    """Stub optional native deps so reference *model* code imports cleanly.

    Only modules irrelevant to the tensors under test are stubbed (pycwt is
    used offline-only; the in-graph inverse CWT is pure torch).
    """
    for name in ("pycwt", "unidecode", "inflect"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.MexicanHat = object
            mod.cwt = None
            mod.unidecode = lambda s: s
            mod.engine = lambda: None
            sys.modules[name] = mod


def _load_reference():
    _stub_missing_modules()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def _case_ids(data):
    return sorted({k[: -len("_x")] for k in data.files if k.endswith("_x")})


def job_conv1d(data):
    import torch

    out = {}
    for key in _case_ids(data):
        x, w, b, stride, pad, dil, groups = [
            data[f"{key}_{f}"] for f in
            ("x", "w", "b", "stride", "pad", "dil", "groups")]
        y = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w),
            torch.from_numpy(b) if b.size else None,
            stride=int(stride), padding=int(pad), dilation=int(dil),
            groups=int(groups))
        out[key] = y.numpy()
    return out


def job_conv_transpose1d(data):
    import torch

    out = {}
    for key in _case_ids(data):
        x, w, b, stride, pad = [
            data[f"{key}_{f}"] for f in ("x", "w", "b", "stride", "pad")]
        y = torch.nn.functional.conv_transpose1d(
            torch.from_numpy(x), torch.from_numpy(w),
            torch.from_numpy(b) if b.size else None,
            stride=int(stride), padding=int(pad))
        out[key] = y.numpy()
    return out


def job_adaptive_pool(data):
    import torch

    out = {}
    for key in _case_ids(data):
        x = data[f"{key}_x"]
        size = int(data[f"{key}_size"])
        y = torch.nn.functional.adaptive_avg_pool1d(torch.from_numpy(x), size)
        out[key] = y.numpy()
    return out


def job_reference_fs2(data):
    """Run the reference FastSpeech2 (random-initialized, seeded) forward and
    dump both the torch checkpoint-layout state dict and the outputs."""
    import torch

    _load_reference()
    from fs_two.model import FastSpeech2

    torch.manual_seed(int(data["seed"]))

    preprocess_config = {
        "path": {"preprocessed_path": str(data["stats_dir"])},
        "preprocessing": {
            "pitch": {"feature": "phoneme_level"},
            "energy": {"feature": "phoneme_level"},
            "mel": {"n_mel_channels": 80},
        },
    }

    class MC(dict):
        # reference accesses model_config both as dict and attribute
        # (modules.py:25 `model_config.use_cwt`)
        __getattr__ = dict.__getitem__

    model_config = MC({
        "transformer": {
            "encoder_layer": int(data["encoder_layer"]),
            "encoder_head": 2,
            "encoder_hidden": int(data["hidden"]),
            "variance_hidden": int(data["hidden"]),
            "decoder_layer": int(data["decoder_layer"]),
            "decoder_head": 2,
            "conv_filter_size": int(data["filter"]),
            "conv_kernel_size": [9, 1],
            "encoder_dropout": 0.2,
            "decoder_dropout": 0.2,
            "decoder_hidden": int(data["hidden"]),
        },
        "variance_predictor": {
            "filter_size": int(data["hidden"]),
            "kernel_size": 3,
            "dropout": 0.5,
        },
        "variance_embedding": {
            "pitch_quantization": "linear",
            "energy_quantization": "linear",
            "n_bins": 256,
        },
        "use_cwt": bool(data["use_cwt"]),
        "multi_speaker": True,
        "max_seq_len": int(data["max_seq_len"]),
    })

    model = FastSpeech2(preprocess_config, model_config,
                        n_speakers=int(data["n_speakers"]), device="cpu")
    if "postnet_dim" in data.files:
        # The reference hard-codes a 512-channel PostNet
        # (fastspeech2.py/Layers.py:79); shrink it for parity fixtures so
        # the recorded state dicts stay small enough to commit.
        from fs_two.transformer.Layers import PostNet as RefPostNet

        model.postnet = RefPostNet(80, int(data["postnet_dim"]), 5, 5)
    model.eval()

    det_spec = None
    if "det_weights" in data.files:
        # Full-size fixtures: overwrite every param/BN-stat with values both
        # sides regenerate from (name, shape) — see tests/det_weights.py.
        # Sinusoid tables and stats.json-derived bucketize bins keep their
        # computed values (the jax side computes its own).
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from det_weights import apply_det_weights_torch

        with torch.no_grad():
            det_spec = apply_det_weights_torch(
                model, seed=int(data["det_weights"]),
                skip=("position_enc", "pitch_bins", "energy_bins"))

    speakers = torch.from_numpy(data["speakers"]).long()
    texts = torch.from_numpy(data["texts"]).long()
    src_lens = torch.from_numpy(data["src_lens"]).long()

    kwargs = {}
    if "d_targets" in data.files:
        kwargs = dict(
            mels=torch.from_numpy(data["mels"]).float(),
            mel_lens=torch.from_numpy(data["mel_lens"]).long(),
            max_mel_len=int(data["mel_lens"].max()),
            e_targets=torch.from_numpy(data["e_targets"]).float(),
            d_targets=torch.from_numpy(data["d_targets"]).long(),
            pitches_raw=torch.from_numpy(data["p_targets"]).float(),
            pitches_cwt=torch.from_numpy(data["p_cwt"]).float(),
        )
    with torch.no_grad():
        result = model(
            speakers, texts, src_lens, int(data["texts"].shape[1]),
            p_control=float(data["p_control"]),
            e_control=float(data["e_control"]),
            d_control=float(data["d_control"]),
            **kwargs,
        )
    (mel, p_pred, e_pred, logd_pred, d_rounded, src_masks, mel_masks,
     src_lens_o, mel_lens_o, postnet_mel, p_mean, p_std) = result

    out = {
        "mel": mel.numpy(),
        "pitch_prediction": p_pred.numpy(),
        "energy_prediction": e_pred.numpy(),
        "log_duration_prediction": logd_pred.numpy(),
        "duration_rounded": d_rounded.numpy().astype(np.float32),
        "mel_lens": mel_lens_o.numpy().astype(np.int64),
        "postnet_mel": postnet_mel.numpy(),
    }
    if det_spec is not None:
        # det mode: record names+shapes only (values regenerate on load).
        for name, shape in det_spec:
            out["shape__" + name] = np.asarray(shape, np.int64)
    else:
        # Dump the state dict in reference .pth.tar layout for the converter.
        state = model.state_dict()
        for k, v in state.items():
            out["state__" + k] = v.numpy()
    return out


def job_reference_hifigan(data):
    """Run the reference HiFi-GAN generator (random weights) and dump both
    its raw (weight-normed) state dict and its output waveform."""
    import torch

    _load_reference()
    from hifi.models import Generator

    torch.manual_seed(int(data["seed"]))

    class AttrDict(dict):
        __getattr__ = dict.__getitem__

    h = AttrDict(
        resblock=str(data["resblock"]),
        upsample_rates=[int(v) for v in data["upsample_rates"]],
        upsample_kernel_sizes=[int(v) for v in data["upsample_kernel_sizes"]],
        upsample_initial_channel=int(data["upsample_initial_channel"]),
        resblock_kernel_sizes=[int(v) for v in data["resblock_kernel_sizes"]],
        resblock_dilation_sizes=[[int(x) for x in row]
                                 for row in data["resblock_dilation_sizes"]],
    )
    model = Generator(h)
    model.eval()

    det_spec = None
    if "det_weights" in data.files:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from det_weights import apply_det_weights_torch

        with torch.no_grad():
            det_spec = apply_det_weights_torch(
                model, seed=int(data["det_weights"]))
        state = None
    else:
        state = {k: v.numpy().copy() for k, v in model.state_dict().items()}

    mel = torch.from_numpy(data["mel"]).float()  # (B, 80, T)
    with torch.no_grad():
        if "skip_remove_weight_norm" not in data.files:
            model.remove_weight_norm()
        wav = model(mel)
    out = {"wav": wav.numpy()}
    if det_spec is not None:
        for name, shape in det_spec:
            out["shape__" + name] = np.asarray(shape, np.int64)
    else:
        for k, v in state.items():
            out["state__" + k] = v
    return out


def job_reference_discriminators(data):
    """Reference MultiPeriodDiscriminator + MultiScaleDiscriminator forward
    (hifi/models.py:213-374) with det weights (tests/det_weights.py),
    including the spectral-normed first MSD scale. Records per-scale logits,
    per-fmap abs-means (full fmaps would be tens of MB), the post-forward
    spectral u/v buffers (torch power-iterates once per forward call in
    train mode), and the torch-layout name/shape spec; also torch.saves the
    upstream ``do_*`` checkpoint layout when 'do_out' is given."""
    import torch

    _load_reference()
    from hifi.models import MultiPeriodDiscriminator, MultiScaleDiscriminator

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from det_weights import apply_det_weights_torch

    torch.manual_seed(int(data["seed"]))
    mpd = MultiPeriodDiscriminator()
    msd = MultiScaleDiscriminator()
    with torch.no_grad():
        spec_mpd = apply_det_weights_torch(mpd, seed=int(data["det_weights"]))
        spec_msd = apply_det_weights_torch(msd, seed=int(data["det_weights"]))

    train_mode = "train_mode" in data.files and bool(data["train_mode"])
    (mpd.train() if train_mode else mpd.eval())
    (msd.train() if train_mode else msd.eval())

    y = torch.from_numpy(data["y"]).float()[:, None, :]       # (B, 1, T)
    y_hat = torch.from_numpy(data["y_hat"]).float()[:, None, :]
    if not train_mode:
        # Settle the spectral u/v one power iteration first: with the
        # det-random (unconverged) buffers, sigma = u^T W v is near zero
        # and weights blow up — a regime real checkpoints never hit.
        msd.train()
        with torch.no_grad():
            msd(y, y_hat)
        msd.eval()
    with torch.no_grad():
        p_rs, p_gs, p_fr, p_fg = mpd(y, y_hat)
        s_rs, s_gs, s_fr, s_fg = msd(y, y_hat)

    out = {}
    for tag, tensors in (("mpd_r", p_rs), ("mpd_g", p_gs),
                         ("msd_r", s_rs), ("msd_g", s_gs)):
        for i, t in enumerate(tensors):
            out[f"{tag}_{i}"] = t.numpy()
    for tag, fmaps in (("mpd_fr", p_fr), ("mpd_fg", p_fg),
                       ("msd_fr", s_fr), ("msd_fg", s_fg)):
        out[tag + "_absmean"] = np.array(
            [[float(f.abs().mean()) for f in fm] for fm in fmaps],
            np.float64)
    # post-forward spectral buffers of MSD scale 1
    for name, buf in msd.state_dict().items():
        if name.startswith("discriminators.0.") and (
                name.endswith("weight_u") or name.endswith("weight_v")):
            out["post__" + name] = buf.numpy().copy()
    for name, shape in spec_mpd:
        out["mpd_shape__" + name] = np.asarray(shape, np.int64)
    for name, shape in spec_msd:
        out["msd_shape__" + name] = np.asarray(shape, np.int64)
    if "do_out" in data.files:
        torch.save({"mpd": mpd.state_dict(), "msd": msd.state_dict()},
                   str(data["do_out"]))
    return out


def job_save_reference_checkpoints(data):
    """Build reference-architecture torch models with random weights and
    torch.save them in the exact shipped checkpoint layouts: the FS2
    {model minus speaker_emb, embedding, optimizer} dict (train.py:212-227)
    and the HiFi-GAN {"generator": ...} dict (hifiapi.py:21-22)."""
    import torch

    _load_reference()
    from fs_two.model import FastSpeech2
    from hifi.models import Generator

    torch.manual_seed(int(data["seed"]))

    class MC(dict):
        __getattr__ = dict.__getitem__

    model_config = MC({
        "transformer": {
            "encoder_layer": int(data["encoder_layer"]), "encoder_head": 2,
            "encoder_hidden": int(data["hidden"]),
            "variance_hidden": int(data["hidden"]),
            "decoder_layer": int(data["decoder_layer"]), "decoder_head": 2,
            "conv_filter_size": int(data["filter"]),
            "conv_kernel_size": [9, 1], "encoder_dropout": 0.2,
            "decoder_dropout": 0.2, "decoder_hidden": int(data["hidden"]),
        },
        "variance_predictor": {"filter_size": int(data["hidden"]),
                               "kernel_size": 3, "dropout": 0.5},
        "variance_embedding": {"pitch_quantization": "linear",
                               "energy_quantization": "linear", "n_bins": 256},
        "use_cwt": False, "multi_speaker": True,
        "max_seq_len": int(data["max_seq_len"]),
    })
    preprocess_config = {
        "path": {"preprocessed_path": str(data["stats_dir"])},
        "preprocessing": {"pitch": {"feature": "phoneme_level"},
                          "energy": {"feature": "phoneme_level"},
                          "mel": {"n_mel_channels": 80}},
    }
    fs2 = FastSpeech2(preprocess_config, model_config,
                      n_speakers=int(data["n_speakers"]), device="cpu")
    state = fs2.state_dict()
    embedding = state.pop("speaker_emb.weight")
    torch.save({"model": state, "embedding": embedding, "optimizer": {}},
               str(data["fs2_out"]))

    class AttrDict(dict):
        __getattr__ = dict.__getitem__

    h = AttrDict(resblock="1",
                 upsample_rates=[int(v) for v in data["upsample_rates"]],
                 upsample_kernel_sizes=[int(v) for v in
                                        data["upsample_kernel_sizes"]],
                 upsample_initial_channel=int(data["upsample_initial_channel"]),
                 resblock_kernel_sizes=[int(v) for v in
                                        data["resblock_kernel_sizes"]],
                 resblock_dilation_sizes=[[int(x) for x in row] for row in
                                          data["resblock_dilation_sizes"]])
    gen = Generator(h)
    torch.save({"generator": gen.state_dict()}, str(data["hifi_out"]))
    return {"ok": np.asarray(1)}


def job_melgan(data):
    """Torch reimplementation of the descript MelGAN generator architecture
    (public torch.hub model the reference's MelGAN path loads,
    fs_two/utils/model.py:52-61): random weight-normed weights, forward on
    the given mel, state dict in the hub layout (`model` nn.Sequential)."""
    import torch
    import torch.nn as torch_nn
    from torch.nn.utils import weight_norm

    torch.manual_seed(int(data["seed"]))
    ngf = int(data["ngf"])
    n_res = int(data["n_residual_layers"])
    ratios = [int(r) for r in data["ratios"]]

    class ResnetBlock(torch_nn.Module):
        def __init__(self, dim, dilation):
            super().__init__()
            self.block = torch_nn.Sequential(
                torch_nn.LeakyReLU(0.2),
                torch_nn.ReflectionPad1d(dilation),
                weight_norm(torch_nn.Conv1d(dim, dim, 3, dilation=dilation)),
                torch_nn.LeakyReLU(0.2),
                weight_norm(torch_nn.Conv1d(dim, dim, 1)),
            )
            self.shortcut = weight_norm(torch_nn.Conv1d(dim, dim, 1))

        def forward(self, x):
            return self.shortcut(x) + self.block(x)

    mult = int(2 ** len(ratios))
    layers = [
        torch_nn.ReflectionPad1d(3),
        weight_norm(torch_nn.Conv1d(80, mult * ngf, 7)),
    ]
    for i, r in enumerate(ratios):
        layers += [
            torch_nn.LeakyReLU(0.2),
            weight_norm(torch_nn.ConvTranspose1d(
                mult * ngf, mult * ngf // 2, r * 2, stride=r,
                padding=r // 2 + r % 2, output_padding=r % 2)),
        ]
        layers += [ResnetBlock(mult * ngf // 2, 3 ** j) for j in range(n_res)]
        mult //= 2
    layers += [
        torch_nn.LeakyReLU(0.2),
        torch_nn.ReflectionPad1d(3),
        weight_norm(torch_nn.Conv1d(ngf, 1, 7)),
        torch_nn.Tanh(),
    ]

    class Gen(torch_nn.Module):
        def __init__(self):
            super().__init__()
            self.model = torch_nn.Sequential(*layers)

        def forward(self, x):
            return self.model(x)

    gen = Gen()
    gen.eval()
    mel = torch.from_numpy(data["mel"]).float()  # (B, 80, T)
    with torch.no_grad():
        wav = gen(mel)
    out = {"wav": wav.numpy()}
    for k, v in gen.state_dict().items():
        out["state__" + k] = v.numpy()
    return out


def job_fs2_loss(data):
    """Reference FastSpeech2Loss on synthetic tensors (fs_two/model/loss.py)."""
    import torch

    _load_reference()
    from fs_two.model.loss import FastSpeech2Loss

    class MC(dict):
        __getattr__ = dict.__getitem__

    preprocess_config = {
        "preprocessing": {"pitch": {"feature": "phoneme_level"},
                          "energy": {"feature": "phoneme_level"}}}
    model_config = MC({"use_cwt": bool(data["use_cwt"])})
    loss_fn = FastSpeech2Loss(preprocess_config, model_config)

    t = lambda k: torch.from_numpy(data[k])
    inputs = (None, None, t("speakers"), None, None, None,
              t("mel_targets"), None, None, t("energy_targets"),
              t("duration_targets"), t("pitch_raw_targets"),
              t("pitch_cwt_targets"), t("pitch_mean"), t("pitch_std"))
    predictions = (
        t("mel_pred"), t("pitch_pred"), t("energy_pred"), t("logd_pred"),
        None, t("src_masks") > 0, t("mel_masks") > 0, None, None,
        t("postnet_pred"), t("pitch_mean_pred"), t("pitch_std_pred"))
    losses = loss_fn(inputs, predictions)
    names = ["total", "mel", "pitch", "energy", "duration", "mean", "std"]
    return {n: np.asarray(l.item() if hasattr(l, "item") else l, np.float32)
            for n, l in zip(names, losses)}


def job_torch_stft(data):
    """Magnitude STFT golden values for both reference padding schemes.

    'tacotron': reflect-pad n_fft//2 (fs_two/audio/stft.py:63-70), frames at
    hop (the conv1d-DFT there equals torch.stft(center=False) framing).
    'hifigan': reflect-pad (n_fft-hop)//2, sqrt(power + 1e-9)
    (hifi/meldataset.py:62-70).
    """
    import torch

    y = torch.from_numpy(data["y"])
    n_fft = int(data["n_fft"])
    hop = int(data["hop"])
    win = int(data["win"])
    window = torch.hann_window(win)
    out = {}

    pad_t = n_fft // 2
    yt = torch.nn.functional.pad(y[:, None], (pad_t, pad_t), mode="reflect")[:, 0]
    spec = torch.stft(yt, n_fft, hop_length=hop, win_length=win,
                      window=window, center=False, return_complex=True)
    out["tacotron_mag"] = spec.abs().numpy()
    out["tacotron_energy"] = torch.norm(spec.abs(), dim=1).numpy()

    pad_h = (n_fft - hop) // 2
    yh = torch.nn.functional.pad(y[:, None], (pad_h, pad_h), mode="reflect")[:, 0]
    spec = torch.stft(yh, n_fft, hop_length=hop, win_length=win,
                      window=window, center=False, return_complex=True)
    out["hifigan_mag"] = torch.sqrt(spec.abs() ** 2 + 1e-9).numpy()
    return out


def job_reference_inverse_cwt(data):
    """Reference in-graph inverse CWT (fs_two/cwt/cwt_utils.py:54-66)."""
    import torch

    _load_reference()
    from fs_two.cwt.cwt_utils import inverse_batch_cwt

    coefs = torch.from_numpy(data["coefs"]).float()
    out = inverse_batch_cwt(coefs)
    return {"recon": out.numpy()}


def job_pyworld_f0(data):
    """pyworld dio+stonemask at hop period — the reference's exact F0 call
    (fs_two/preprocessor/preprocessor.py:207-213). pyworld is not
    installable in this environment; the job exists so that any environment
    where it IS importable records golden fixtures on first run
    (oracle_util record/replay), closing DIO parity numerically. Raises a
    recognizable marker otherwise (the test skips on it)."""
    try:
        import pyworld as pw
    except ImportError as e:
        raise RuntimeError("PYWORLD_UNAVAILABLE") from e

    wav = data["wav"].astype(np.float64)
    sr = int(data["sr"])
    hop = int(data["hop"])
    f0, t = pw.dio(wav, sr, frame_period=hop / sr * 1000)
    f0 = pw.stonemask(wav, f0, t, sr)
    return {"f0": f0.astype(np.float64)}


JOBS = {
    "pyworld_f0": job_pyworld_f0,
    "conv1d": job_conv1d,
    "torch_stft": job_torch_stft,
    "reference_inverse_cwt": job_reference_inverse_cwt,
    "conv_transpose1d": job_conv_transpose1d,
    "adaptive_pool": job_adaptive_pool,
    "reference_fs2": job_reference_fs2,
    "reference_discriminators": job_reference_discriminators,
    "save_reference_checkpoints": job_save_reference_checkpoints,
    "reference_hifigan": job_reference_hifigan,
    "melgan": job_melgan,
    "fs2_loss": job_fs2_loss,
}


def main():
    job, in_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    data = np.load(in_path, allow_pickle=False)
    out = JOBS[job](data)
    np.savez(out_path, **out)


if __name__ == "__main__":
    main()
