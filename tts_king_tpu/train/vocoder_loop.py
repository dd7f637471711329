"""HiFi-GAN training driver: epochs over MelDataset segments, periodic
checkpointing (orbax, full GAN state), validation mel-L1, JSONL metrics.

Completes the capability the reference stubs (hifiapi.py:32-33); recipe and
hyperparameters follow config.vocoder (config.yaml:16-38).

Data parallel: with use_mesh=True (default) and >1 device, the GAN state is
replicated over a 1-D dp mesh and every batch is sharded on its batch axis —
XLA inserts the gradient psums. The heaviest training workload in this stack
(HiFi-GAN at 22 kHz) scales over ICI like the FS2 step does.
"""

import os
from typing import List, Optional

import jax
import numpy as np

from tts_king_tpu.config import TTSConfig
from tts_king_tpu.checkpoint import restore_train_state, save_train_state
from tts_king_tpu.data.mel_dataset import MelDataset
from tts_king_tpu.train.vocoder import VocoderTrainer
from tts_king_tpu.utils.logging import MetricsLogger

VOC_LOSS_NAMES = ("disc", "gen", "mel_l1", "fm", "adv")


def train_vocoder(cfg: TTSConfig, wav_paths: List[str],
                  val_paths: Optional[List[str]] = None,
                  max_steps: Optional[int] = None,
                  ckpt_dir: Optional[str] = None,
                  log_every: int = 100, save_every: int = 5000,
                  fine_tuning: bool = False, base_mels_path=None,
                  restore_step: Optional[int] = None,
                  disc_p_channels=None, msd_width: int = 1,
                  use_mesh: bool = True):
    """Returns the final VocoderTrainState."""
    vc = cfg.vocoder
    ckpt_dir = ckpt_dir or os.path.join(cfg.train.ckpt_path, "vocoder")
    os.makedirs(ckpt_dir, exist_ok=True)

    dataset = MelDataset(wav_paths, vc, split=True, fine_tuning=fine_tuning,
                         base_mels_path=base_mels_path, seed=vc.seed)
    steps_per_epoch = max(len(dataset) // vc.batch_size, 1)
    trainer = VocoderTrainer(vc, disc_p_channels=disc_p_channels,
                             msd_width=msd_width,
                             steps_per_epoch=steps_per_epoch)
    state = trainer.init_state(jax.random.PRNGKey(vc.seed),
                               vc.segment_size // vc.hop_size)

    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        from tts_king_tpu.parallel.mesh import build_mesh, replicated

        mesh = build_mesh(dp=-1, tp=1)
        if vc.batch_size % mesh.shape["dp"]:
            # Same fail-loud contract as the FS2 loop: a silent one-device
            # fallback would cost dp-times throughput without a word.
            raise ValueError(
                f"vocoder batch_size={vc.batch_size} does not shard evenly "
                f"over dp={mesh.shape['dp']}; pick a divisible batch size "
                f"or pass use_mesh=False.")
        state = jax.device_put(state, replicated(mesh))

    if restore_step is not None:
        from flax.serialization import from_state_dict

        payload = restore_train_state(ckpt_dir, restore_step)
        restored = from_state_dict(state, payload["extra"]["gan_state"])
        state = restored
        if mesh is not None:
            from tts_king_tpu.parallel.mesh import replicated

            state = jax.device_put(state, replicated(mesh))

    step_fn = jax.jit(trainer.make_train_step())
    logger = MetricsLogger(cfg.train.result_path, cfg.exp_name + "_vocoder",
                           cfg.logger.wandb_key, cfg.logger.offline)

    def save(step):
        from flax.serialization import to_state_dict

        save_train_state(
            ckpt_dir, step,
            {"params": trainer.export_inference_params(state.gen_params)},
            opt_state=None,
            extra={"gan_state": to_state_dict(jax.device_get(state))})

    total = max_steps if max_steps is not None else 10 ** 9
    step = int(state.step)
    epoch = 0
    try:
        while step < total:
            epoch += 1
            for batch in dataset.batches(vc.batch_size, seed=vc.seed + epoch):
                if mesh is not None:
                    from tts_king_tpu.parallel.mesh import globalize_batch

                    batch = globalize_batch(mesh, batch)
                state, losses = step_fn(state, batch)
                step += 1
                if step % log_every == 0:
                    logger.log(step, {n: float(v) for n, v in
                                      zip(VOC_LOSS_NAMES, tuple(losses))},
                               prefix="vocoder")
                if step % save_every == 0:
                    save(step)
                if step >= total:
                    break
    except (KeyboardInterrupt, Exception):
        save(step)
        logger.close()
        raise
    save(step)
    logger.close()
    return state
