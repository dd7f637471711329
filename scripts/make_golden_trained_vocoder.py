#!/usr/bin/env python
"""Generate the trained-vocoder golden fixture
(tests/fixtures/golden_trained_vocoder/).

The golden_e2e fixture freezes a *seed-initialized* micro HiFi-GAN, which
guards the generator forward but not the GAN TRAINING path. This trains the
micro vocoder for a few hundred adversarial steps on formant speech and
freezes (folded inference params, one input mel, expected waveform), so any
regression in the GAN losses / optimizer / weight-norm training geometry /
export folding moves the frozen wav and fails tests/test_golden_vocoder_trained.py.

Run on CPU f32 (frozen numerics are platform-tied to the test env):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python scripts/make_golden_trained_vocoder.py
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from tests.test_golden_vocoder_trained import (FIXTURE, STEPS,
                                                   micro_voc_config)
    from tts_king_tpu.data.synthetic import generate_corpus
    from tts_king_tpu.ops.stft import hifigan_mel
    from tts_king_tpu.models.hifigan import Generator
    from tts_king_tpu.train.vocoder import VocoderTrainer
    from tts_king_tpu.data.mel_dataset import MelDataset

    import jax

    vc = micro_voc_config()
    raw = "/tmp/golden_voc/raw"
    if not os.path.isdir(raw):
        os.makedirs(raw, exist_ok=True)
        generate_corpus(raw, n_speakers=2, utts_per_speaker=10, seed=11)
    wavs = sorted(glob.glob(os.path.join(raw, "*", "*.wav")))

    dataset = MelDataset(wavs, vc, split=True, seed=vc.seed)
    trainer = VocoderTrainer(vc, disc_p_channels=(4, 8, 8, 8, 8),
                             msd_width=32, steps_per_epoch=1000)
    state = trainer.init_state(jax.random.PRNGKey(vc.seed),
                               vc.segment_size // vc.hop_size)
    step_fn = jax.jit(trainer.make_train_step())
    step = 0
    epoch = 0
    while step < STEPS:
        epoch += 1
        for batch in dataset.batches(vc.batch_size, seed=vc.seed + epoch):
            state, losses = step_fn(state, batch)
            step += 1
            if step % 50 == 0:
                print(f"step {step}: mel_l1={float(losses.mel_l1):.3f} "
                      f"disc={float(losses.disc):.3f}", flush=True)
            if step >= STEPS:
                break

    folded = trainer.export_inference_params(state.gen_params)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(folded)[0]:
        key = "/".join(getattr(k, "key", str(k)) for k in path)
        flat[key] = np.asarray(leaf)

    # frozen input mel: first 48 frames of the first wav's mel
    from tts_king_tpu.data.features import load_wav

    wav0 = load_wav(wavs[0], vc.sampling_rate)
    mel = np.asarray(hifigan_mel(
        wav0[None, : 48 * vc.hop_size + vc.n_fft], vc.n_fft, vc.num_mels,
        vc.sampling_rate, vc.hop_size, vc.win_size, vc.mel_fmin,
        vc.mel_fmax), np.float32)[:, :48]

    gen = Generator(vc, weight_norm=False)
    expected = np.asarray(gen.apply({"params": folded}, mel), np.float32)

    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(FIXTURE, mel=mel, expected_wav=expected,
                        **{f"param:{k}": v for k, v in flat.items()})
    print(f"frozen {FIXTURE}: wav {expected.shape}, "
          f"{len(flat)} param leaves, "
          f"{os.path.getsize(FIXTURE)/1e6:.2f} MB")


if __name__ == "__main__":
    main()
