"""End-to-end batched synthesis benchmark on real TPU hardware.

BASELINE.md config 3: batched multi-speaker synthesis, text -> mel (full
FastSpeech2 at its shipped size) -> waveform (full HiFi-GAN V1). The
reference publishes no speed numbers (BASELINE.json `published: {}`), so the
comparison point is the BASELINE.md north-star target: synthesis RTF < 0.01
per chip. vs_baseline = target_rtf / measured_rtf (>1 beats the target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

TARGET_RTF = 0.01
SAMPLE_RATE = 22050
HOP = 256


def main():
    import jax
    import jax.numpy as jnp

    from tts_king_tpu.config import TTSConfig
    from tts_king_tpu.models.fs2 import build_fastspeech2
    from tts_king_tpu.models.hifigan import Generator

    cfg = TTSConfig()  # shipped sizes: 4L/6L d256 FS2, 512-ch HiFi-GAN x256
    stats = {"pitch": [-7.0, 9.5], "energy": [-1.4, 6.1]}

    # Throughput-optimal serving batch: compute scales sublinearly with B
    # while the per-call relay latency (~36 ms here) amortizes.
    B, L, T = 32, 128, 1000
    rng = np.random.RandomState(0)
    speakers = jnp.asarray(rng.randint(0, 66, (B,)), jnp.int32)
    texts = jnp.asarray(rng.randint(1, 206, (B, L)), jnp.int32)
    src_lens = jnp.full((B,), L, jnp.int32)

    # bfloat16 compute (MXU-native precision); params stay f32 and flax
    # casts at apply time.
    fs2 = build_fastspeech2(cfg.model, stats, n_speakers=66,
                            dtype=jnp.bfloat16)
    fs2_vars = fs2.init(jax.random.PRNGKey(0), speakers, texts, src_lens,
                        train=False)
    voc = Generator(cfg.vocoder, dtype=jnp.bfloat16)
    voc_vars = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 80)))

    @jax.jit
    def synthesize(fs2_vars, voc_vars, speakers, texts, src_lens):
        out = fs2.apply(fs2_vars, speakers, texts, src_lens, max_mel_len=T,
                        train=False)
        wav = voc.apply(voc_vars, out["postnet_mel"])
        # Device-side checksum: fetching this scalar forces the full
        # computation (block_until_ready is unreliable through the remote
        # TPU relay in this environment).
        return wav, jnp.sum(wav)

    # Warm up / compile.
    wav, chk = synthesize(fs2_vars, voc_vars, speakers, texts, src_lens)
    float(chk)

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        wav, chk = synthesize(fs2_vars, voc_vars, speakers, texts, src_lens)
        float(chk)
    elapsed = time.perf_counter() - t0

    audio_seconds = n_iters * B * (T * HOP) / SAMPLE_RATE
    rtf = elapsed / audio_seconds
    result = {
        "metric": "batched_synthesis_rtf",
        "value": round(rtf, 6),
        "unit": "rtf_per_chip",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
