"""jit-compiled training step (forward pair + loss + grads + optimizer),
batch-sharded data parallel under GSPMD.

Replaces the reference train loop body (train.py:211-244: autocast forward,
XPointLoss, GradScaler backward, Adam step). On TPU the whole step is one
XLA program: bf16 activations replace AMP, gradients all-reduce over ICI
automatically because parameters are replicated and the batch is sharded.
"""
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Optional learning-rate scale set from the HOST once per epoch (exact
    # torch StepLR/ExponentialLR semantics: scheduler.step() per epoch,
    # reference train.py:316-317). When set, the tx must NOT include its
    # own lr factor. A step-count staircase inside tx would drift from the
    # reference whenever --max-steps or resume changes steps-per-epoch.
    lr: Any = None

    @classmethod
    def create(cls, params, batch_stats, tx, lr=None):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params), tx=tx,
                   lr=None if lr is None else jnp.asarray(lr, jnp.float32))

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        if self.lr is not None:
            updates = jax.tree.map(lambda u: u * self.lr, updates)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def _pair_routing_args(batch):
    """Per-sample encoder routing (random_pairs shuffling) and HomographyNet
    input ordering derived from the batch — shared by train and eval steps
    so validation routes spectra exactly like training."""
    opt = batch["optical"]
    is_o = opt.get("is_optical")
    is_t = batch["thermal"].get("is_optical")
    eye = jnp.eye(3, dtype=jnp.float32)
    optical_not_warped = None
    if "homography" in opt:
        optical_not_warped = jnp.all(
            jnp.abs(opt["homography"] - eye) < 1e-6, axis=(1, 2))
    return (optical_not_warped,
            None if is_o is None else is_o.reshape(-1),
            None if is_t is None else is_t.reshape(-1))


def make_train_step(module, loss_fn, takes_pair=True, donate=True,
                    batch_fn=None):
    """Build the jitted train step.

    Batch layout (takes_pair):
        batch['optical'|'thermal']: image (B,H,W,1), keypoints (B,H,W),
        valid_mask (B,H,W), homography (B,3,3); optional batch['hfour_points'].

    With batch_fn, the raw `batch` argument is first mapped through
    batch_fn(rng, batch) INSIDE the jit program — the device-resident data
    path (data/device_dataset.py) uses this to assemble + augment batches
    on device so the host contributes nothing per step but the dispatch.
    """

    def step_fn(state, batch, rng):
        if batch_fn is not None:
            rng, rng_batch = jax.random.split(rng)
            batch = batch_fn(rng_batch, batch)
        rng_model, rng_loss = jax.random.split(rng)

        def compute_loss(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            rngs = {"droppath": rng_model, "dropout": rng_model}
            if takes_pair:
                not_warped, is_o, is_t = _pair_routing_args(batch)
                (pred_o, pred_t, pred_hm), mut = module.apply(
                    variables, batch["optical"]["image"],
                    batch["thermal"]["image"], True, not_warped, is_o, is_t,
                    method=module.forward_pair, mutable=mutable, rngs=rngs)
                loss, comps = loss_fn(batch, pred_o, pred_t, pred_hm, rng_loss)
            else:
                pred, mut = module.apply(
                    variables, batch["image"], "mixed",
                    batch["is_optical"].reshape(-1), True,
                    mutable=mutable, rngs=rngs)
                loss, comps = loss_fn(batch, pred, None, None, rng_loss)
            new_stats = mut.get("batch_stats") if mutable else None
            return loss, (comps, new_stats)

        (loss, (comps, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        # torch.cuda.amp.GradScaler skips optimizer.step() when the grads
        # contain inf/nan (reference train.py:238-244 scaler.step/update);
        # mirror that so one bad batch (a loss spike, a degenerate
        # augmentation draw) costs one step instead of poisoning the params
        # for the rest of the run. jnp.where keeps the step fully jittable.
        finite = jnp.isfinite(loss)
        for g in jax.tree.leaves(grads):
            finite = finite & jnp.all(jnp.isfinite(g))
        new_state = state.apply_gradients(grads)
        if new_stats is not None:
            new_state = new_state.replace(batch_stats=new_stats)
        state = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_state, state)
        comps["loss"] = loss
        comps["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        return state, comps

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(module, loss_fn, takes_pair=True):
    """jit loss-only evaluation step (reference validation pass,
    train.py:267-296): eval-mode forward (running BN stats, no dropout)."""

    def step_fn(state, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        rng = jax.random.PRNGKey(0)
        if takes_pair:
            not_warped, is_o, is_t = _pair_routing_args(batch)
            pred_o, pred_t, pred_hm = module.apply(
                variables, batch["optical"]["image"],
                batch["thermal"]["image"], False, not_warped, is_o, is_t,
                method=module.forward_pair)
            loss, comps = loss_fn(batch, pred_o, pred_t, pred_hm, rng)
        else:
            pred = module.apply(variables, batch["image"], "mixed",
                                batch["is_optical"].reshape(-1), False)
            loss, comps = loss_fn(batch, pred, None, None, rng)
        return loss, comps

    return jax.jit(step_fn)
