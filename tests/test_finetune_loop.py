"""End-to-end FS2 -> HiFi-GAN fine-tuning bridge (the full reference recipe,
hifi/meldataset.py:88-175, runnable with two commands):

  train micro FS2 -> make_base_mels (teacher-forced predicted mels + aligned
  GT wav slices) -> MelDataset(fine_tuning=True) -> train_vocoder a few
  steps -> synthesize through the folded inference generator.
"""

import dataclasses
import glob
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tests.test_data_pipeline import _make_corpus


@pytest.fixture(scope="module")
def ft_env(tmp_path_factory):
    from tts_king_tpu.config import (ModelConfig, OptimizerConfig,
                                     PreprocessConfig, StepConfig,
                                     TrainConfig, TransformerConfig,
                                     TTSConfig, VariancePredictorConfig)
    from tts_king_tpu.data.features import Preprocessor

    root = tmp_path_factory.mktemp("fttest")
    raw = str(root / "raw")
    processed = str(root / "processed")
    os.makedirs(raw)
    _make_corpus(raw)
    pp = PreprocessConfig(raw_path=raw, preprocessed_path=processed,
                          val_size=1)
    Preprocessor(pp, batch_size=4).build_from_path()

    cfg = TTSConfig(
        preprocess=pp,
        model=ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=1, encoder_head=2, encoder_hidden=16,
                variance_hidden=16, decoder_layer=1, decoder_head=2,
                decoder_hidden=16, conv_filter_size=32),
            variance_predictor=VariancePredictorConfig(filter_size=16),
            max_seq_len=96),
        train=TrainConfig(
            ckpt_path=str(root / "ckpt"), result_path=str(root / "result"),
            optimizer=OptimizerConfig(batch_size=1, grad_acc_step=2),
            step=StepConfig(total_step=2, log_step=10, synth_step=100,
                            val_step=100, save_step=2)),
    )
    cfg.vocoder = dataclasses.replace(
        cfg.vocoder, upsample_rates=[8, 8, 2, 2],
        upsample_kernel_sizes=[16, 16, 4, 4], upsample_initial_channel=16,
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
        segment_size=2048, batch_size=2)
    return cfg


def test_finetune_bridge_end_to_end(ft_env):
    import jax

    from scripts.make_base_mels import make_base_mels
    from tts_king_tpu.train.loop import train
    from tts_king_tpu.train.vocoder_loop import train_vocoder

    cfg = ft_env
    hop = cfg.preprocess.stft.hop_length

    # 1. micro FS2 training -> checkpoint
    train(cfg, max_steps=2, use_mesh=False)
    assert os.path.isdir(os.path.join(cfg.train.ckpt_path, "step_00000002"))

    # 2. teacher-forced base mels + aligned GT wav slices
    out_dir = make_base_mels(cfg, batch_size=2)
    mels = sorted(glob.glob(os.path.join(out_dir, "mels", "*.npy")))
    wavs = sorted(glob.glob(os.path.join(out_dir, "wavs", "*.wav")))
    assert len(mels) == 4 and len(wavs) == 4  # 2 speakers x 2 utts
    for mp, wp in zip(mels, wavs):
        mel = np.load(mp)
        assert mel.ndim == 2 and mel.shape[1] == 80
        from scipy.io import wavfile

        sr, wav = wavfile.read(wp)
        assert sr == cfg.preprocess.audio.sampling_rate
        # frame-aligned: wav covers exactly the mel frames
        assert len(wav) == mel.shape[0] * hop

    # GT-aligned means the predicted mel must resemble the GT mel far more
    # than noise would: same frame count as the saved GT mel.
    ds_mel = sorted(glob.glob(os.path.join(
        cfg.preprocess.preprocessed_path, "mel", "*.npy")))
    name = os.path.basename(mels[0])[:-len(".npy")]  # "<spk>-<utt>"
    spk, utt = name.split("-", 1)
    gt = np.load(os.path.join(cfg.preprocess.preprocessed_path, "mel",
                              f"{spk}-mel-{utt}.npy"))
    assert np.load(mels[0]).shape[0] == gt.shape[0]

    # 3. fine-tune the micro vocoder on (GT wav, predicted mel) pairs
    state = train_vocoder(
        cfg, wavs, max_steps=3,
        ckpt_dir=os.path.join(cfg.train.ckpt_path, "vocoder_ft"),
        log_every=1, save_every=100, fine_tuning=True,
        base_mels_path=os.path.join(out_dir, "mels"),
        disc_p_channels=(4, 8, 8, 8, 8), msd_width=16, use_mesh=False)
    assert int(jax.device_get(state.step)) == 3

    # 4. synthesize through the folded inference generator
    from tts_king_tpu.models.hifigan import Generator
    from tts_king_tpu.train.vocoder import VocoderTrainer

    trainer = VocoderTrainer(cfg.vocoder, disc_p_channels=(4, 8, 8, 8, 8),
                             msd_width=16)
    folded = trainer.export_inference_params(state.gen_params)
    gen = Generator(cfg.vocoder, weight_norm=False)
    mel = np.load(mels[0])[None]
    wav_out = np.asarray(gen.apply({"params": folded}, mel))
    assert wav_out.shape[-1] == mel.shape[1] * hop
    assert np.isfinite(wav_out).all()
