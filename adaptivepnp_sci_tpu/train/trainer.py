"""Generic denoiser trainer: optax Adam + milestone LR, SVD orthogonalization,
orbax checkpoint/resume, optional data-parallel mesh.

Reference parity: milestone schedule lr -> lr/10 -> lr/1000 with
orthogonalization disabled at the last milestone
(``packages/ffdnet/train.py:113-122``); checkpoint dicts with model +
optimizer + step (``packages/DDnet/train_common.py:110-125``) and resume
(``:21-64``); validation PSNR gating (``train_DDnet.py:167-191``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adaptivepnp_sci_tpu.ops.metrics import psnr
from adaptivepnp_sci_tpu.train.regularizers import svd_orthogonalize
from adaptivepnp_sci_tpu.train.tasks import TrainTask
from adaptivepnp_sci_tpu.utils.logging import get_logger

log = get_logger(__name__)


@dataclass
class TrainerConfig:
    lr: float = 1e-3
    milestones: tuple[int, int] = (50, 60)   # epochs: /10 then /1000+no-orthog
    epochs: int = 80
    steps_per_epoch: int = 1000
    orthogonalize_every: int = 0             # steps; 0 = off
    ckpt_dir: str | None = None
    ckpt_every_epochs: int = 10
    seed: int = 42
    mesh: Any = None                          # optional ('data','frame') Mesh
    tensorboard_dir: str | None = None        # scalar logging (reference: tensorboardX)


class Trainer:
    def __init__(self, task: TrainTask, variables: Any, config: TrainerConfig):
        self.task = task
        self.config = config
        # own a copy: train steps donate their input buffers, which must not
        # invalidate arrays the caller still holds
        self.variables = jax.tree_util.tree_map(jnp.array, variables)
        spe = config.steps_per_epoch
        schedule = optax.piecewise_constant_schedule(
            config.lr,
            {
                (config.milestones[0] + 1) * spe: 0.1,
                (config.milestones[1] + 1) * spe: 0.01,
            },
        )
        self.optimizer = optax.adam(schedule)
        self.opt_state = self.optimizer.init(variables["params"])
        self.step = 0
        self._key = jax.random.PRNGKey(config.seed)
        self._jit_step = self._build_step()
        self._tb = None
        if config.tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(config.tensorboard_dir)
            except ImportError:
                log.warning("tensorboard unavailable; scalar logging disabled")

    def _build_step(self):
        task, optimizer = self.task, self.optimizer

        def train_step(variables, opt_state, key, batch):
            frozen = {k: v for k, v in variables.items() if k != "params"}

            def loss_of(p):
                loss, mutated = task.loss_fn({"params": p, **frozen}, key, batch)
                return loss, mutated

            (loss, mutated), grads = jax.value_and_grad(loss_of, has_aux=True)(
                variables["params"]
            )
            updates, opt_state = optimizer.update(
                grads, opt_state, variables["params"]
            )
            params = optax.apply_updates(variables["params"], updates)
            variables = {"params": params, **frozen, **mutated}
            return variables, opt_state, loss

        step = jax.jit(train_step, donate_argnums=(0, 1))

        if self.config.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self.config.mesh
            batch_s = NamedSharding(mesh, P(("data", "frame")))
            repl = NamedSharding(mesh, P())

            def sharded(variables, opt_state, key, batch):
                return step(
                    jax.device_put(variables, repl),
                    jax.device_put(opt_state, repl),
                    key,
                    jax.device_put(batch, batch_s),
                )

            return sharded
        return step

    def train_step(self, batch: np.ndarray):
        """One step; returns the loss as a DEVICE array (not synced) — on
        remote-attached TPUs a per-step host pull costs a full round trip, so
        steps pipeline and callers convert lazily at log points."""
        self._key, sub = jax.random.split(self._key)
        self.variables, self.opt_state, loss = self._jit_step(
            self.variables, self.opt_state, sub,
            jax.tree_util.tree_map(jnp.asarray, batch),  # array OR pytree
        )
        self.step += 1
        cfg = self.config
        if (
            cfg.orthogonalize_every
            and self.step % cfg.orthogonalize_every == 0
            and self.epoch <= cfg.milestones[1]
        ):
            self.variables = {
                **self.variables,
                "params": svd_orthogonalize(self.variables["params"]),
            }
        return loss

    @property
    def epoch(self) -> int:
        return self.step // self.config.steps_per_epoch

    # ---- checkpoint / resume ---------------------------------------------

    def save(self, path: str | None = None) -> None:
        import orbax.checkpoint as ocp

        path = path or os.path.join(self.config.ckpt_dir, f"step_{self.step}")
        ckpt = {
            "variables": self.variables,
            "opt_state": self.opt_state,
            "step": self.step,
        }
        ocp.PyTreeCheckpointer().save(os.path.abspath(path), ckpt, force=True)
        log.info("checkpoint saved -> %s", path)

    def restore(self, path: str) -> None:
        import orbax.checkpoint as ocp

        target = {
            "variables": self.variables,
            "opt_state": self.opt_state,
            "step": self.step,
        }
        ckpt = ocp.PyTreeCheckpointer().restore(os.path.abspath(path), item=target)
        self.variables = ckpt["variables"]
        self.opt_state = ckpt["opt_state"]
        self.step = int(ckpt["step"])
        log.info("resumed from %s at step %d", path, self.step)

    # ---- loops ------------------------------------------------------------

    def fit(
        self,
        batches: Iterator[np.ndarray],
        max_steps: int,
        val_fn: Callable[[Any], float] | None = None,
        val_every: int = 0,
        log_every: int = 100,
    ) -> list[float]:
        losses = []
        for batch in batches:
            losses.append(self.train_step(batch))  # device arrays; lazy sync
            if self.step % log_every == 0:
                loss = float(losses[-1])
                if self._tb:
                    self._tb.add_scalar("train/loss", loss, self.step)
                log.info("step %d epoch %d loss %.6f", self.step, self.epoch, loss)
            if val_every and val_fn and self.step % val_every == 0:
                val = val_fn(self.variables)
                if self._tb:
                    self._tb.add_scalar("val/psnr", val, self.step)
                log.info("step %d val %.3f", self.step, val)
            if (
                self.config.ckpt_dir
                and self.step % (self.config.ckpt_every_epochs
                                 * self.config.steps_per_epoch) == 0
            ):
                self.save()
            if self.step >= max_steps:
                break
        # ONE stacked device->host transfer: per-scalar float() pulls cost a
        # full dispatch round-trip each (30-100 ms over a remote-attached
        # TPU; 25k steps would drain for ~20 minutes after the loop)
        if losses and hasattr(losses[0], "device"):
            losses = np.asarray(jnp.stack(losses))
        return [float(x) for x in losses]


def save_variables_npz(path: str, variables) -> None:
    """Portable inference checkpoint: flatten the variables pytree into one
    ``.npz`` ('/'-joined keys). Topology/sharding-independent, unlike raw
    orbax trees, and a single reviewable artifact."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", variables)
    np.savez(path, **flat)


def load_variables_npz(path: str) -> dict:
    tree: dict = {}
    with np.load(path) as z:
        for key in z.files:
            parts = key.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return tree


def load_checkpoint_variables(path: str):
    """Restore just the model variables from a Trainer checkpoint (orbax
    directory or ``.npz``) for inference.

    Orbax restores as host numpy arrays (``restore_type=np.ndarray``):
    a checkpoint written from a TPU process bakes device shardings into its
    metadata, and a default restore on a CPU-only process fails with
    "Device TPU ... was not found". Numpy restore is topology-independent;
    jit re-places the arrays on first use.
    """
    if path.endswith(".npz"):
        return load_variables_npz(path)
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    meta = ckpt.metadata(os.path.abspath(path)).item_metadata
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), dict(meta)
    )
    raw = ckpt.restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(restore_args=restore_args),
    )
    return raw["variables"]


def validation_psnr(model_apply: Callable, variables, noisy, clean) -> float:
    out = model_apply(variables, noisy)
    return float(psnr(jnp.asarray(clean), jnp.clip(out, 0, 1)))
