"""Training driver: jitted data-parallel train/val steps + fit loop.

Rebuild of the reference training stack (reference: ravvent.py:11-88 +
basecaller.py:222-283): keras ``Model.fit`` becomes an explicit loop over
jit-compiled steps. Differences by design:

- optimizer is optax Adam with keras-style *per-tensor* gradient-norm
  clipping (``Adam(lr, clipnorm=1.)`` semantics — reference: ravvent.py:53-55);
- the val step is fully jitted (the reference runs validation eagerly —
  quirk, basecaller.py:281-283) and uses a fixed-length greedy decode with
  the reference's dynamic ground-truth length bound reproduced via masking;
- data parallelism: batches sharded over a ``('data',)`` mesh, params
  replicated; XLA inserts the gradient psum (SURVEY.md §2.3 — the reference
  is single-process).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ravvent_tpu.config import RunConfig
from ravvent_tpu.decode.greedy import greedy_decode
from ravvent_tpu.models import attention as attn
from ravvent_tpu.models.basecaller import (
    batch_max_target_len,
    encode_input,
    init_basecaller,
    train_forward,
    val_metrics,
)
from ravvent_tpu.parallel.mesh import (
    batch_sharding, make_mesh, memory_sharding, replicated_sharding,
)
from ravvent_tpu.training.checkpoints import CheckpointManager
from ravvent_tpu.training.logging import CSVLogger


def per_leaf_clip_by_norm(max_norm: float) -> optax.GradientTransformation:
    """keras ``clipnorm`` semantics: clip each gradient tensor independently
    to L2 norm <= max_norm (NOT global-norm clipping)."""

    def init(_params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def clip(g):
            n = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-12))
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init, update)


def make_optimizer(learning_rate: float, clipnorm: Optional[float] = None) -> optax.GradientTransformation:
    if clipnorm is not None:
        return optax.chain(per_leaf_clip_by_norm(clipnorm), optax.adam(learning_rate))
    return optax.adam(learning_rate)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class Trainer:
    def __init__(self, cfg: RunConfig, mesh=None, seed: Optional[int] = None) -> None:
        self.cfg = cfg
        self.mcfg = cfg.model
        self.tcfg = cfg.train
        self.mesh = mesh if mesh is not None else make_mesh(cfg.train.num_data_shards)
        self.optimizer = make_optimizer(self.tcfg.learning_rate, self.tcfg.clipnorm)

        tf = float(self.tcfg.teacher_forcing)
        # teacher_forcing semantics (reference: basecaller.py:96-107): a bool/1.0
        # means pure teacher forcing; a float p means scheduled sampling with
        # probability p of feeding the model's own sampled token.
        self.sampling_probability = 0.0 if tf >= 1.0 else tf

        seed = self.tcfg.random_seed if seed is None else seed
        self.rng = jax.random.PRNGKey(seed)
        self.params = init_basecaller(jax.random.PRNGKey(seed), self.mcfg)
        self.opt_state = self.optimizer.init(self.params)

        self._build_steps()

    # ------------------------------------------------------------------
    def _build_steps(self) -> None:
        mcfg = self.mcfg
        optimizer = self.optimizer
        sampling_p = self.sampling_probability

        # Sequence-parallel attention memory on a ('data', 'model') mesh:
        # the memory's S axis shards over 'model'; GSPMD inserts the softmax
        # and context psums. None on a pure-DP mesh.
        mem_s = memory_sharding(self.mesh)
        constrain = None
        if mem_s is not None:
            def constrain(enc_out, mask):
                return (
                    jax.lax.with_sharding_constraint(enc_out, mem_s),
                    jax.lax.with_sharding_constraint(mask, mem_s),
                )

        def train_step(params, opt_state, rng, raw, event, targets):
            def loss_fn(p):
                out = train_forward(p, raw, event, targets, mcfg, sampling_p, rng,
                                    memory_constraint=constrain)
                return out.loss, out

            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss, "acc": out.acc}

        def val_step(params, raw, event, targets):
            enc_out, mask = encode_input(params, raw, event, mcfg)
            if constrain is not None:
                enc_out, mask = constrain(enc_out, mask)
            mem = attn.setup_memory(params["decoder"]["attention"], enc_out, mask)
            T = targets.shape[1]
            max_steps = batch_max_target_len(targets) - 1  # reference quirk #4
            tokens, logits = greedy_decode(
                params["decoder"], mem, mcfg.vocab_size, T - 1, max_steps,
                mcfg.effective_attention, mcfg.cell_type,
            )
            loss, acc = val_metrics(targets[:, 1:], tokens, logits, targets)
            return {"loss": loss, "acc": acc}

        if len(self.mesh.devices.flat) > 1:
            bs = batch_sharding(self.mesh)
            rs = replicated_sharding(self.mesh)
            self._train_step = jax.jit(
                train_step,
                in_shardings=(rs, rs, rs, bs, bs, bs),
                out_shardings=(rs, rs, rs),
                donate_argnums=(0, 1),
            )
            self._val_step = jax.jit(
                val_step, in_shardings=(rs, bs, bs, bs), out_shardings=rs
            )
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
            self._val_step = jax.jit(val_step)

    # ------------------------------------------------------------------
    def train_on_batch(self, batch) -> Dict[str, float]:
        raw, event, targets = (jnp.asarray(x) for x in batch)
        self.rng, step_rng = jax.random.split(self.rng)
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, step_rng, raw, event, targets
        )
        return metrics

    def validate_on_batch(self, batch) -> Dict[str, float]:
        raw, event, targets = (jnp.asarray(x) for x in batch)
        return self._val_step(self.params, raw, event, targets)

    # ------------------------------------------------------------------
    def fit(
        self,
        train_gen,
        val_gen=None,
        epochs: Optional[int] = None,
        steps_per_epoch: Optional[int] = None,
        validation_steps: Optional[int] = None,
        initial_epoch: int = 0,
        csv_log_path: Optional[str] = None,
        checkpoint_manager: Optional[CheckpointManager] = None,
        batch_callbacks: Iterable[Callable[[int, Dict[str, float]], None]] = (),
        verbose: bool = True,
    ) -> Dict[str, list]:
        epochs = epochs if epochs is not None else self.tcfg.epochs
        steps_per_epoch = steps_per_epoch or self.tcfg.steps_per_epoch
        validation_steps = validation_steps or self.tcfg.validation_steps
        csv = CSVLogger(csv_log_path) if csv_log_path else None

        history: Dict[str, list] = {"loss": [], "acc": [], "val_loss": [], "val_acc": []}
        has_cbs = bool(tuple(batch_callbacks))
        for epoch in range(initial_epoch, epochs):
            t0 = time.perf_counter()
            # Metrics stay on device until the epoch ends (materializing every
            # batch would force a host sync per step — costly on
            # remote-attached devices). Callbacks opt back into per-batch sync.
            device_metrics = []
            t_step0 = time.perf_counter()
            for i, batch in enumerate(train_gen.steps(steps_per_epoch)):
                m = self.train_on_batch(batch)
                device_metrics.append(m)
                if has_cbs:
                    lf, af = float(m["loss"]), float(m["acc"])
                    for cb in batch_callbacks:
                        cb(i, {"loss": lf, "acc": af})
                if verbose and (i + 1) % 100 == 0:
                    dt = time.perf_counter() - t_step0
                    print(
                        f"  step {i + 1}/{steps_per_epoch} "
                        f"loss {float(m['loss']):.4f} ({dt / (i + 1):.3f}s/step)",
                        flush=True,
                    )
            n = len(device_metrics)
            # One bulk device_get instead of 2n sequential scalar syncs
            # (each costs a transport round trip on remote devices).
            host_metrics = jax.device_get(device_metrics)
            tr_loss = sum(float(m["loss"]) for m in host_metrics)
            tr_acc = sum(float(m["acc"]) for m in host_metrics)
            metrics = {"loss": tr_loss / max(n, 1), "acc": tr_acc / max(n, 1)}

            if val_gen is not None:
                vms = jax.device_get(
                    [self.validate_on_batch(batch)
                     for batch in val_gen.steps(validation_steps)]
                )
                vn = len(vms)
                metrics["val_loss"] = sum(float(m["loss"]) for m in vms) / max(vn, 1)
                metrics["val_acc"] = sum(float(m["acc"]) for m in vms) / max(vn, 1)

            for k, v in metrics.items():
                history.setdefault(k, []).append(v)
            if csv:
                csv.log(epoch, metrics)
            if checkpoint_manager is not None:
                # reference schema: one directory per epoch, save_best_only=False
                checkpoint_manager.save(
                    self.cfg.checkpoint_path(epoch + 1),
                    self.params,
                    self.opt_state,
                    epoch=epoch + 1,
                    rng=self.rng,
                    data_seed=getattr(train_gen, "random_seed", 0),
                )
            if verbose:
                dt = time.perf_counter() - t0
                msg = " - ".join(f"{k}: {v:.4f}" for k, v in metrics.items())
                print(f"epoch {epoch + 1}/{epochs} [{dt:.1f}s] {msg}", flush=True)
        return history
