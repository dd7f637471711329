"""Golden END-TO-END regression fixture: a micro FastSpeech2 checkpoint
TRAINED on the formant corpus, committed in tests/fixtures/golden_e2e/
(orbax tree + speakers.json + stats.json + expected.npz), driven through
the full public pipeline — text frontend -> checkpoint restore ->
AcousticModel buckets -> Vocoder -> int16 scaling (TTSKing.speak,
tts_king.py:18-66 reference surface).

test_golden.py guards FS2.apply numerics on random weights; this fixture
additionally guards everything around the model: G2P/cleaners, the orbax
restore path, mel-bucket padding/trim, prosody-control plumbing and the
vocoder contract, with realistic trained weights. Any drift in any of
those layers moves the frozen mel/wav and fails here.

Regenerate consciously with scripts/make_golden_e2e.py (CPU f32 — the
frozen outputs are platform-tied to the test env).
"""

import pytest
import os

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fixtures", "golden_e2e")

# (text, duration_control) pairs frozen in expected.npz — the second entry
# exercises the prosody-control path end to end.
SENTENCES = [("привет мир", 1.0), ("привет мир", 1.3)]


def micro_config(fixture_dir=FIXTURE_DIR, raw_path="/tmp/golden_e2e/raw",
                 processed_path="/tmp/golden_e2e/processed"):
    """The exact TTSConfig the fixture was trained and frozen with: micro
    d32 FS2 (postnet 32), micro HiFi-GAN (seed-init, 32 channels). Shared
    by scripts/make_golden_e2e.py so generation and verification can never
    drift apart."""
    from tts_king_tpu.config import (AcousticCheckpointConfig, ModelConfig,
                                     OptimizerConfig, PreprocessConfig,
                                     StepConfig, TrainConfig,
                                     TransformerConfig, TTSConfig,
                                     VariancePredictorConfig,
                                     VocoderModelConfig)

    return TTSConfig(
        exp_name="golden_e2e",
        preprocess=PreprocessConfig(
            raw_path=raw_path, preprocessed_path=processed_path, val_size=4,
            lexicon_path=os.path.join(fixture_dir, "lexicon.dict")),
        model=ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=2, encoder_head=2, encoder_hidden=32,
                variance_hidden=32, decoder_layer=2, decoder_head=2,
                decoder_hidden=32, conv_filter_size=64,
                conv_kernel_size=(9, 1)),
            variance_predictor=VariancePredictorConfig(filter_size=32),
            postnet_dim=32, max_seq_len=256),
        acoustic=AcousticCheckpointConfig(
            weights_path=os.path.join(fixture_dir, "ckpt")),
        vocoder=VocoderModelConfig(upsample_initial_channel=32),
        train=TrainConfig(
            ckpt_path=os.path.join(fixture_dir, "ckpt"),
            result_path="/tmp/golden_e2e/result",
            optimizer=OptimizerConfig(batch_size=8, grad_acc_step=1,
                                      warm_up_step=100),
            step=StepConfig(total_step=500, log_step=100, synth_step=10 ** 9,
                            val_step=10 ** 9, save_step=10 ** 9)),
    )


@pytest.mark.slow
def test_golden_e2e_speak():
    from tts_king_tpu.pipeline import TTSKing

    z = np.load(os.path.join(FIXTURE_DIR, "expected.npz"))
    king = TTSKing(micro_config())

    for i, (text, dctl) in enumerate(SENTENCES):
        phonemes = king.text_preprocess(text)
        np.testing.assert_array_equal(
            phonemes, z[f"phonemes_{i}"],
            err_msg="text frontend drifted (G2P/cleaners/symbol table)")

        mel, mel_lens = king.generate_mel(text, duration_control=dctl,
                                          speaker=0)
        n = int(np.asarray(mel_lens)[0])
        assert n == int(z[f"mel_len_{i}"]), (
            f"duration path drifted: {n} frames vs {int(z[f'mel_len_{i}'])}")
        mel = np.asarray(mel, np.float32)[0, :n]
        mae = float(np.mean(np.abs(mel - z[f"mel_{i}"])))
        assert mae < 1e-3, f"mel MAE {mae} vs frozen fixture"

        wav = king.mel_to_wav(
            np.asarray(mel)[None], mel_lens=np.asarray([n]))[0]
        ref_wav = z[f"wav_{i}"]
        assert wav.shape == ref_wav.shape
        # int16 samples; allow a +-2 LSB band for f32 reassociation noise.
        frac_off = float(np.mean(
            np.abs(wav.astype(np.int32) - ref_wav.astype(np.int32)) > 2))
        assert frac_off < 1e-3, (
            f"{frac_off:.2%} of wav samples off by >2 LSB vs fixture")
