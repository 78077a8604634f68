"""BC trainer with warmup+cosine LR, grad clipping, checkpoints.

Reference: dm_control/scripts/trainer.py:22-140 — `TrainerConfig`
(grad_norm_clip=1.0, token-based linear-warmup → cosine decay to 10%,
trainer.py:30-36,99-112), epoch loop with train/test splits, best-loss
checkpointing (`save_checkpoint` :56), DataParallel multi-GPU (:54).

TPU design: one jit-compiled train_step (forward+backward+adamw update
fused by XLA); data parallelism via jax.sharding over a device mesh
instead of DataParallel — params replicated, batch sharded, XLA inserts
the gradient psum over ICI.  The decay/no-decay parameter split
(reference model.py:234-279 configure_optimizers) becomes an optax
weight-decay mask: only Dense kernels decay.
"""

from __future__ import annotations

import functools
import time

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax


class TrainerConfig:
    """reference trainer.py:22-40."""

    max_epochs = 10
    batch_size = 64
    learning_rate = 3e-4
    betas = (0.9, 0.95)
    grad_norm_clip = 1.0
    weight_decay = 0.1
    lr_decay = False
    warmup_tokens = 375e6
    final_tokens = 260e9
    ckpt_path = None
    num_workers = 0
    seed = 0

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)


def _decay_mask(params):
    """True for Dense kernels; biases / LayerNorm / pos_emb / log_std are
    not decayed (reference model.py:234-279)."""

    def mask(path, leaf):
        return path[-1].key == "kernel"

    return jax.tree_util.tree_map_with_path(mask, params)


def lr_multiplier(tokens, config):
    """Token-based schedule (reference trainer.py:99-112)."""
    if tokens < config.warmup_tokens:
        return float(tokens) / float(max(1, config.warmup_tokens))
    progress = float(tokens - config.warmup_tokens) / float(
        max(1, config.final_tokens - config.warmup_tokens))
    return max(0.1, 0.5 * (1.0 + np.cos(np.pi * progress)))


class Trainer:
    """Epoch loop over TrajectoryDataset splits (reference
    trainer.py:42-140)."""

    def __init__(self, model, train_dataset, test_dataset, config,
                 mesh=None):
        self.model = model
        self.train_dataset = train_dataset
        self.test_dataset = test_dataset
        self.config = config
        self.mesh = mesh
        self.tokens = 0
        self.best_loss = float("inf")
        self.params = None
        self.opt_state = None

        def make_opt(learning_rate):
            return optax.chain(
                optax.clip_by_global_norm(config.grad_norm_clip),
                optax.adamw(learning_rate, b1=config.betas[0],
                            b2=config.betas[1],
                            weight_decay=config.weight_decay,
                            mask=_decay_mask))

        self._optimizer = optax.inject_hyperparams(make_opt)(
            learning_rate=config.learning_rate)

        @jax.jit
        def train_step(params, opt_state, obs, targets, lr_scale):
            def loss_fn(p):
                _, loss = model.apply({"params": p}, obs, targets,
                                      deterministic=False,
                                      rngs={"dropout": jax.random.PRNGKey(0)})
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            opt_state.hyperparams["learning_rate"] = (
                self.config.learning_rate * lr_scale)
            updates, opt_state = self._optimizer.update(
                grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def eval_step(params, obs, targets):
            _, loss = model.apply({"params": params}, obs, targets,
                                  deterministic=True)
            return loss

        self._train_step = train_step
        self._eval_step = eval_step

    def init(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(
            self.config.seed)
        obs, act = self.train_dataset[0]
        obs = jnp.asarray(obs[None])
        act = jnp.asarray(act[None])
        if obs.ndim == 3 and self.model.__class__.__name__ == "FFNet":
            obs, act = obs[:, 0], act[:, 0]
        variables = self.model.init({"params": rng, "dropout": rng},
                                    obs, act)
        self.params = variables["params"]
        self.opt_state = self._optimizer.init(self.params)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            self.params = jax.device_put(self.params, rep)
        return self.params

    def _prep(self, obs, act):
        obs = jnp.asarray(obs)
        act = jnp.asarray(act)
        if self.model.__class__.__name__ == "FFNet" and obs.ndim == 3:
            obs, act = obs[:, 0], act[:, 0]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P("data"))
            obs = jax.device_put(obs, sh)
            act = jax.device_put(act, sh)
        return obs, act

    def _epoch_batches(self, dataset, rng):
        """Yields one epoch of batches; with num_workers > 0 and the
        native toolchain available, batches come from the C++ prefetch
        ring (dm_control_tpu/native) so gather overlaps the device step
        (the DataLoader-worker analogue of reference trainer.py:64)."""
        config = self.config
        n = max(1, len(dataset) // config.batch_size)
        if config.num_workers > 0:
            try:
                from dm_control_tpu.native import PrefetchLoader

                loader = PrefetchLoader(
                    dataset, config.batch_size,
                    seed=int(rng.randint(1 << 31)),
                    n_threads=config.num_workers)
                try:
                    for _ in range(n):
                        yield loader.next()
                finally:
                    loader.close()
                return
            except RuntimeError:
                pass  # no toolchain: fall through to numpy batches
        yield from dataset.batches(rng, config.batch_size)

    def run_epoch(self, split, epoch, rng):
        config = self.config
        dataset = (self.train_dataset if split == "train"
                   else self.test_dataset)
        losses = []
        t0 = time.time()
        for it, (obs, act) in enumerate(
                self._epoch_batches(dataset, rng)):
            obs, act = self._prep(obs, act)
            if split == "train":
                if config.lr_decay:
                    self.tokens += int(np.prod(act.shape[:-1]))
                    lr_scale = lr_multiplier(self.tokens, config)
                else:
                    lr_scale = 1.0
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, obs, act,
                    jnp.float32(lr_scale))
            else:
                loss = self._eval_step(self.params, obs, act)
            losses.append(float(loss))
        dt = time.time() - t0
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        print(f"epoch {epoch + 1} {split}: loss {mean_loss:.5f} "
              f"({len(losses)} iters, {dt:.1f}s)")
        return mean_loss

    def save_checkpoint(self):
        """reference trainer.py:56-60."""
        if self.config.ckpt_path is None:
            return
        with open(self.config.ckpt_path, "wb") as f:
            f.write(flax.serialization.to_bytes(self.params))

    def load_checkpoint(self, path=None):
        path = path or self.config.ckpt_path
        with open(path, "rb") as f:
            self.params = flax.serialization.from_bytes(
                self.params, f.read())
        return self.params

    def train(self):
        """reference trainer.py:62-140."""
        if self.params is None:
            self.init()
        rng = np.random.RandomState(self.config.seed)
        history = []
        for epoch in range(self.config.max_epochs):
            train_loss = self.run_epoch("train", epoch, rng)
            test_loss = None
            if self.test_dataset is not None:
                test_loss = self.run_epoch("test", epoch, rng)
            good = test_loss if test_loss is not None else train_loss
            if good < self.best_loss:
                self.best_loss = good
                self.save_checkpoint()
            history.append((train_loss, test_loss))
        return history
