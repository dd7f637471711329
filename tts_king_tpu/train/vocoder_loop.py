"""HiFi-GAN training driver: epochs over MelDataset segments, periodic
checkpointing (orbax, full GAN state), validation mel-L1, JSONL metrics.

Completes the capability the reference stubs (hifiapi.py:32-33); recipe and
hyperparameters follow config.vocoder (config.yaml:16-38).

Data parallel: with use_mesh=True (default) and >1 device, the GAN state is
replicated over a 1-D dp mesh and every batch is sharded on its batch axis —
XLA inserts the gradient psums. The heaviest training workload in this stack
(HiFi-GAN at 22 kHz) scales over ICI like the FS2 step does.

Multi-host: distributed=True (after jax.distributed.initialize, see
scripts/train_vocoder.py --distributed) builds the mesh over ALL processes'
devices, each process loads only its row block of every batch
(MelDataset.batches(shard=...), bit-identical global batches via per-item
crop RNG), state is created/restored ON the global mesh, and first
dispatches run in lockstep (parallel/lockstep.py) — the same driver
contract as the FS2 loop (train/loop.py).
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
                  use_mesh: bool = True, distributed: bool = False,
                  compute_dtype=None):
    """Returns the final VocoderTrainState.

    compute_dtype: activation dtype for the GAN step (see VocoderTrainer);
    None = f32. bf16 is the TPU fast path (results/gan_step_profile.jsonl)."""
    from tts_king_tpu.parallel.lockstep import (coordination_barrier,
                                                maybe_lockstep)

    vc = cfg.vocoder
    ckpt_dir = ckpt_dir or os.path.join(cfg.train.ckpt_path, "vocoder")
    os.makedirs(ckpt_dir, exist_ok=True)
    if distributed:
        # absorb per-process startup skew before any collective exists
        coordination_barrier("ttk_vocoder_startup")

    dataset = MelDataset(wav_paths, vc, split=True, fine_tuning=fine_tuning,
                         base_mels_path=base_mels_path, seed=vc.seed)
    if len(dataset) < vc.batch_size:
        # batches() would yield nothing and the epoch loop would spin
        # forever — fail loudly like the batch-divisibility check does
        raise ValueError(
            f"{len(dataset)} training wavs < vocoder batch_size="
            f"{vc.batch_size}; add data or lower the batch size")
    steps_per_epoch = max(len(dataset) // vc.batch_size, 1)
    trainer = VocoderTrainer(vc, disc_p_channels=disc_p_channels,
                             msd_width=msd_width,
                             steps_per_epoch=steps_per_epoch,
                             compute_dtype=compute_dtype)

    mesh = None
    shard = None
    if distributed or (use_mesh and len(jax.devices()) > 1):
        from tts_king_tpu.parallel.mesh import build_mesh, replicated

        mesh = build_mesh(dp=-1, tp=1)
        if vc.batch_size % mesh.shape["dp"]:
            # Same fail-loud contract as the FS2 loop: a silent one-device
            # fallback would cost dp-times throughput without a word.
            raise ValueError(
                f"vocoder batch_size={vc.batch_size} does not shard evenly "
                f"over dp={mesh.shape['dp']}; pick a divisible batch size "
                f"or pass use_mesh=False.")
        if distributed:
            shard = (jax.process_index(), jax.process_count())
        # Create the replicated state ON the (possibly multi-host) mesh:
        # init inside jit with replicated out_shardings — device_put of
        # host arrays can't build cross-process global arrays.
        state = maybe_lockstep(
            jax.jit(lambda: trainer.init_state(
                jax.random.PRNGKey(vc.seed), vc.segment_size // vc.hop_size),
                out_shardings=replicated(mesh)),
            "voc_init")()
    else:
        state = trainer.init_state(jax.random.PRNGKey(vc.seed),
                                   vc.segment_size // vc.hop_size)

    if restore_step is not None:
        from flax.serialization import from_state_dict

        payload = restore_train_state(ckpt_dir, restore_step)
        restored = from_state_dict(jax.device_get(state)
                                   if mesh is None else state,
                                   payload["extra"]["gan_state"])
        if mesh is not None:
            # host arrays -> global replicated arrays on the mesh (each
            # process contributes the shards its devices own)
            from tts_king_tpu.parallel.mesh import globalize_like

            state = globalize_like(state, restored)
        else:
            state = jax.tree.map(np.asarray, restored)

    # donate: the loop rebinds state every step (old GAN params + both
    # Adam states are dead after the call) — halves peak optimizer memory
    step_fn = maybe_lockstep(jax.jit(trainer.make_train_step(),
                                     donate_argnums=(0,)),
                             "voc_train_step")

    val_set = None
    if val_paths:
        vp = list(val_paths)
        if len(vp) < vc.batch_size:
            # cycle up to one full batch: crops differ per item (per-item
            # RNG), and one compile shape is kept for any val-set size
            vp = (vp * vc.batch_size)[: vc.batch_size]
        val_set = MelDataset(vp, vc, split=True, fine_tuning=fine_tuning,
                             base_mels_path=base_mels_path, seed=vc.seed,
                             shuffle=False)
        eval_fn = maybe_lockstep(jax.jit(trainer.make_eval_step()),
                                 "voc_eval_step")

    def validate(step, state):
        """Validation mel-L1 over the val split (deterministic crops)."""
        if val_set is None:
            return
        vals = []
        for vb in val_set.batches(vc.batch_size, seed=vc.seed, shard=shard):
            if mesh is not None:
                from tts_king_tpu.parallel.mesh import globalize_batch

                vb = globalize_batch(mesh, vb)
            vals.append(eval_fn(state, vb))
        if vals:
            # fetch on every process (symmetric), log on process 0
            v = float(np.mean(jax.device_get(vals)))
            logger.log(step, {"val_mel_l1": v}, prefix="vocoder_val")
    if jax.process_index() == 0:
        logger = MetricsLogger(cfg.train.result_path,
                               cfg.exp_name + "_vocoder",
                               cfg.logger.wandb_key, cfg.logger.offline)
    else:
        logger = _NullVocLogger()

    if mesh is not None:
        from tts_king_tpu.parallel.mesh import replicated as _replicated

        # The weight-norm fold must produce GLOBAL replicated arrays on the
        # mesh: eager jnp ops on global arrays yield host-local
        # SingleDeviceSharding results, which orbax refuses to serialize in
        # a multi-process run.
        export_fold = jax.jit(trainer.export_inference_params,
                              out_shardings=_replicated(mesh))
    else:
        export_fold = trainer.export_inference_params

    def save(step):
        from flax.serialization import to_state_dict

        # device arrays go straight to orbax: multi-host-safe sharded
        # saves, no device_get of (potentially) non-addressable shards
        save_train_state(
            ckpt_dir, step,
            {"params": export_fold(state.gen_params)},
            opt_state=None,
            extra={"gan_state": to_state_dict(state)})

    total = max_steps if max_steps is not None else 10 ** 9
    step = int(state.step)
    epoch = 0
    try:
        while step < total:
            epoch += 1
            for batch in dataset.batches(vc.batch_size, seed=vc.seed + epoch,
                                         shard=shard):
                if mesh is not None:
                    from tts_king_tpu.parallel.mesh import globalize_batch

                    batch = globalize_batch(mesh, batch)
                state, losses = step_fn(state, batch)
                step += 1
                if step % log_every == 0:
                    # fetch on EVERY process (symmetric forcing of the
                    # async queue; train/loop.py has the full rationale),
                    # write on process 0
                    host = {n: float(v) for n, v in
                            zip(VOC_LOSS_NAMES, jax.device_get(tuple(losses)))}
                    logger.log(step, host, prefix="vocoder")
                if step % save_every == 0:
                    validate(step, state)
                    save(step)
                if step >= total:
                    break
    except (KeyboardInterrupt, Exception):
        # single-process only: a distributed orbax save is itself a
        # collective and exceptions are not guaranteed symmetric.
        # Best-effort: if the crash happened after the failing step already
        # donated `state`'s buffers, the save itself fails — report it and
        # re-raise the ORIGINAL error (save_every checkpoints are the floor).
        try:
            if jax.process_count() == 1:
                save(step)
        except Exception as save_err:
            import sys

            sys.stderr.write(
                f"[train_vocoder] emergency checkpoint failed: {save_err}\n")
        finally:
            logger.close()
        raise
    validate(step, state)
    save(step)
    logger.close()
    return state


class _NullVocLogger:
    def log(self, *a, **k):
        pass

    def close(self):
        pass
