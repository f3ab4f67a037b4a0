"""Training orchestration: dataset -> jit train step -> checkpoints/logging.

Parity with reference train.py:
  * YAML-driven (dataset/model/loss/training sections), params.yaml dumped
    to the output dir (:40-42) and reread by every eval CLI,
  * Adam + optional StepLR/ExponentialLR schedulers (:180-192),
  * checkpoints every save_every_n_epoch as e{N} plus latest (:308-327),
    resume epoch parsed from the checkpoint name (:70-74),
  * TensorBoard batch/epoch scalars (:259-306).

TPU re-design: the whole step (pair forward, loss, grads, Adam) is one jit
program, batch-sharded over the device mesh; bf16 activations replace AMP;
BatchNorm stats are global across shards by construction.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .config import save_yaml
from .data import get_dataset, DataLoader
from .losses import XPointLoss
from .models import build_xpoint
from .parallel import (make_mesh, shard_batch, replicate, make_train_step,
                       TrainState)
from . import checkpoints as ckpt


def make_optimizer(training_cfg, steps_per_epoch=None):
    """Adam (+ optional per-EPOCH StepLR/ExponentialLR decay, matching the
    reference's scheduler.step() once per epoch, train.py:316-317) and
    torch-style L2 weight decay (grad += wd * param before the Adam
    moments — NOT decoupled AdamW).

    Returns (tx, lr_at_epoch). With a scheduler, tx carries NO lr factor
    and ``lr_at_epoch(epoch)`` gives the exact torch LR for that epoch —
    the trainer sets it on TrainState.lr once per epoch, so --max-steps /
    resumed runs keep the reference decay boundaries exactly (a step-count
    staircase, the previous design, drifted whenever the true
    steps-per-epoch differed from len(loader)).
    """
    del steps_per_epoch  # legacy arg: boundaries are epoch-exact now
    lr = float(training_cfg.get('learningrate', 1e-4))
    sched_cfg = training_cfg.get('scheduler', {}) or {}
    lr_at_epoch = None
    if sched_cfg.get('use_scheduler'):
        stype = sched_cfg.get('type', 'ExponentialLR')
        gamma = float(sched_cfg.get('gamma', 0.9))
        step_size = int(sched_cfg.get('step_size', 1))
        if stype == 'StepLR':
            # torch StepLR: lr * gamma^(epoch // step_size)
            lr_at_epoch = lambda e: lr * gamma ** (e // step_size)
        elif stype == 'ExponentialLR':
            # torch ExponentialLR: lr * gamma^epoch
            lr_at_epoch = lambda e: lr * gamma ** e
        else:
            raise ValueError(f"unknown scheduler {stype}")
    wd = float(training_cfg.get('weight_decay', 0) or 0)
    decay = [optax.add_decayed_weights(wd)] if wd > 0 else []
    if lr_at_epoch is not None:
        # lr applied via TrainState.lr (set per epoch); tx only negates
        tx = optax.chain(*decay, optax.scale_by_adam(), optax.scale(-1.0))
    else:
        tx = optax.chain(*decay, optax.scale_by_adam(),
                         optax.scale_by_learning_rate(lr))
    return tx, lr_at_epoch


def batch_to_device_pair(batch):
    """Convert a collated pair batch to the loss/model layout."""
    def side(d):
        out = {'image': np.asarray(d['image'], np.float32),
               'valid_mask': np.asarray(d['valid_mask'], np.float32),
               'homography': np.asarray(d['homography'], np.float32)}
        if 'keypoints' in d:
            out['keypoints'] = np.asarray(d['keypoints'], np.float32)
        if 'is_optical' in d:
            out['is_optical'] = np.asarray(d['is_optical'], bool)
        return out
    out = {'optical': side(batch['optical']), 'thermal': side(batch['thermal'])}
    if 'hfour_points' in batch:
        out['hfour_points'] = np.asarray(batch['hfour_points'], np.float32)
    return out


def batch_to_device_single(batch):
    out = {'image': np.asarray(batch['image'], np.float32),
           'valid_mask': np.asarray(batch['valid_mask'], np.float32),
           'is_optical': np.asarray(batch['is_optical'], bool)}
    if 'keypoints' in batch:
        out['keypoints'] = np.asarray(batch['keypoints'], np.float32)
    return out


class Trainer:
    def __init__(self, config, output_dir, n_devices=None, seed=0):
        self.config = config
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        save_yaml(config, os.path.join(output_dir, 'params.yaml'))

        self.dataset = get_dataset(config['dataset'])
        tcfg = config.get('training', {})
        self.batch_size = int(tcfg.get('batchsize', 1))
        # reference train.py:54-55 threads `training: num_worker` into its
        # DataLoader; same key here (thread pool, data/loader.py)
        workers = int(tcfg.get('num_worker', 1) or 1)
        self.loader = DataLoader(self.dataset, self.batch_size, shuffle=True,
                                 seed=seed, workers=workers)
        self.takes_pair = self.dataset.returns_pair()

        # validation set (reference train.py:57-62): same dataset type with
        # overridden filename/keypoints
        self.val_loader = None
        vcfg = (tcfg.get('validation') or {})
        self.val_every = int(vcfg.get('every_nth_epoch', 1) or 1)
        if vcfg.get('compute_validation_loss'):
            val_ds_cfg = dict(config['dataset'])
            val_ds_cfg['filename'] = vcfg.get('filename',
                                              val_ds_cfg.get('filename'))
            if vcfg.get('keypoints'):
                val_ds_cfg['keypoints_filename'] = vcfg['keypoints']
            val_dataset = get_dataset(val_ds_cfg)
            self.val_loader = DataLoader(val_dataset, self.batch_size,
                                         shuffle=False, seed=seed,
                                         workers=workers)

        self.module, self.model_cfg = build_xpoint(config['model'])

        loss_cfg = dict(config.get('loss', {}))
        loss_cfg['space_to_depth_ratio'] = self.module.encoder_downsample_ratio
        self.loss_fn = XPointLoss(loss_cfg)

        self.mesh = make_mesh(n_devices)
        self.tx, self.lr_at_epoch = make_optimizer(tcfg)
        self.rng = jax.random.PRNGKey(seed)

        # init params with a sample batch shape
        sample = self.dataset[0]
        img = (sample['optical']['image'] if self.takes_pair
               else sample['image'])[None]
        variables = jax.jit(lambda r: self.module.init(
            r, jnp.asarray(img), method=self.module.init_all))(
                jax.random.PRNGKey(seed))
        # pretrained-encoder bootstrap (reference train.py:78-129)
        variables = self._maybe_load_pretrained_encoder(variables)

        self.state = TrainState.create(
            variables['params'], variables.get('batch_stats'), self.tx,
            lr=(self.lr_at_epoch(0) if self.lr_at_epoch else None))
        self.start_epoch = 0

        # device-resident data path: whole corpus in HBM, batch assembly +
        # homographic augmentation inside the jitted step (the host-worker
        # pipeline above is the parity path; this is the TPU-first one —
        # see data/device_dataset.py)
        self.device_data = bool(tcfg.get('device_data')) and self.takes_pair
        batch_fn = None
        if self.device_data:
            from .data.device_dataset import (load_resident_pair_data,
                                              make_resident_batch_fn)
            data, meta = load_resident_pair_data(self.dataset)
            self.resident_data = replicate(data, self.mesh)
            hm_check = bool((config['model'].get(
                'homography_regression_head') or {}).get('check'))
            batch_fn = make_resident_batch_fn(
                self.dataset.config, meta, hm_input=hm_check,
                mesh=(self.mesh if len(self.mesh.devices) > 1 else None))
            self.data_rng = np.random.default_rng(seed)

        self.train_step = make_train_step(self.module, self.loss_fn,
                                          takes_pair=self.takes_pair,
                                          batch_fn=batch_fn)
        from .parallel.train_step import make_eval_step
        self.eval_step = make_eval_step(self.module, self.loss_fn,
                                        takes_pair=self.takes_pair)

        self.writer = None
        if tcfg.get('use_writer'):
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(os.path.join(output_dir, 'tb'))
            except ImportError:
                pass

    def _maybe_load_pretrained_encoder(self, variables):
        ua = (self.config.get('model', {}) or {}).get('use_attention', {}) or {}
        pre = ua.get('pretrained', {}) or {}
        if not (ua.get('check') and pre.get('check')):
            return variables
        type_dir = pre.get('type_dir')
        if not type_dir or not os.path.isdir(type_dir):
            print(f"pretrained encoder dir not found ({type_dir}); "
                  f"training from scratch", flush=True)
            return variables
        ckpts = [f for f in os.listdir(type_dir)
                 if f.endswith(('.pth', '.model', '.ckpt', '.pt'))]
        if not ckpts:
            print(f"no pretrained encoder checkpoint in {type_dir}; "
                  f"training from scratch", flush=True)
            return variables
        path = os.path.join(type_dir, sorted(ckpts)[0])
        import torch
        from .compat.torch_converter import convert_pretrained_encoder
        sd = torch.load(path, map_location='cpu', weights_only=True)
        for key in ('state_dict', 'model', 'model_state_dict'):
            if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
                sd = sd[key]
                break
        variables = convert_pretrained_encoder(sd, self.module, variables)
        print(f"loaded pretrained encoder weights from {path}", flush=True)
        return variables

    def load_weights(self, path):
        """Initialize training from an existing checkpoint file — the
        fine-tuning entry point (reference train.py -w/--weight-file,
        :75-84: torch.load + load_state_dict(strict=False)).

        Accepts an orbax checkpoint (<name>.ckpt) or a reference torch
        checkpoint (.model/.pth/.pt, converted on load). strict=False
        semantics: every leaf whose path and shape match the freshly
        initialized model is taken from the file; everything else keeps
        its init, and the missing/unexpected counts are reported like
        torch's. The optimizer state starts fresh, as in the reference
        (its optimizer is constructed after the load, train.py:180-192).
        """
        if path.endswith('.ckpt'):
            import orbax.checkpoint as ocp
            with ocp.PyTreeCheckpointer() as cp:
                restored = cp.restore(os.path.abspath(path))
            loaded = {'params': restored['params']}
            if restored.get('batch_stats'):
                loaded['batch_stats'] = restored['batch_stats']
        else:
            from .compat import load_torch_checkpoint
            loaded = load_torch_checkpoint(path, self.module, self.model_cfg)

        stats = {'used': 0, 'missing': 0, 'unexpected': 0, 'shape': 0}

        def merge(init, new, where):
            if not isinstance(init, dict):
                # leaf in the init tree
                if isinstance(new, dict):
                    stats['unexpected'] += 1
                    return init
                if jnp.shape(new) != jnp.shape(init):
                    stats['shape'] += 1
                    print(f"  shape mismatch at {where}: "
                          f"{jnp.shape(new)} vs {jnp.shape(init)} (kept init)",
                          flush=True)
                    return init
                stats['used'] += 1
                return jnp.asarray(new)
            out = {}
            for k, v in init.items():
                if isinstance(new, dict) and k in new:
                    out[k] = merge(v, new[k], f"{where}/{k}")
                else:
                    stats['missing'] += sum(
                        1 for _ in jax.tree.leaves(v))
                    out[k] = v
            if isinstance(new, dict):
                for k in new:
                    if k not in init:
                        stats['unexpected'] += sum(
                            1 for _ in jax.tree.leaves(new[k]))
            return out

        init_vars = {'params': self.state.params}
        if self.state.batch_stats is not None:
            init_vars['batch_stats'] = self.state.batch_stats
        merged = merge(init_vars, loaded, '')
        self.state = TrainState.create(
            merged['params'], merged.get('batch_stats'), self.tx,
            lr=(self.lr_at_epoch(0) if self.lr_at_epoch else None))
        print(f"initialized weights from {path}: {stats['used']} tensors "
              f"loaded, {stats['missing']} missing (kept init), "
              f"{stats['unexpected']} unexpected (ignored), "
              f"{stats['shape']} shape mismatches", flush=True)
        return stats

    def resume(self, name='latest'):
        restored, epoch = ckpt.restore(self.output_dir, self.state, name)
        if restored is not None:
            self.state = restored
            self.start_epoch = epoch
        return self.start_epoch

    def _epoch_batches(self):
        """One epoch of batches: host loader, or device-resident index
        payloads (same shuffle/drop-last schedule as DataLoader)."""
        if not self.device_data:
            yield from self.loader
            return
        idx = self.data_rng.permutation(len(self.dataset))
        for s in range(0, len(idx) - self.batch_size + 1, self.batch_size):
            yield {'data': self.resident_data,
                   'idx': jnp.asarray(idx[s:s + self.batch_size])}

    def train(self, n_epochs=None, max_steps_per_epoch=None, log_every=10):
        tcfg = self.config.get('training', {})
        n_epochs = n_epochs or int(tcfg.get('n_epochs', 1))
        save_every = int(tcfg.get('save_every_n_epoch', 0) or 0)

        self.state = replicate(self.state, self.mesh)
        step = 0
        for epoch in range(self.start_epoch, n_epochs):
            if self.lr_at_epoch is not None:
                # exact reference scheduler: LR recomputed from the true
                # epoch counter (robust to --max-steps and resume)
                self.state = self.state.replace(
                    lr=jnp.asarray(self.lr_at_epoch(epoch), jnp.float32))
            epoch_losses = []
            epoch_skips = []
            t_epoch = time.time()
            for i, batch in enumerate(self._epoch_batches()):
                if max_steps_per_epoch and i >= max_steps_per_epoch:
                    break
                if self.device_data:
                    dev_batch = batch       # {'data', 'idx'}: already on device
                else:
                    dev_batch = (batch_to_device_pair(batch)
                                 if self.takes_pair
                                 else batch_to_device_single(batch))
                    dev_batch = shard_batch(dev_batch, self.mesh)
                self.rng, step_rng = jax.random.split(self.rng)
                with self.mesh:
                    self.state, comps = self.train_step(self.state, dev_batch,
                                                        step_rng)
                # keep losses on device: a float() here would force a
                # host<->device round trip EVERY step, serializing dispatch
                # against execution (reference analog: item() per batch,
                # train.py:243 — on TPU that sync costs the whole pipelining
                # win). Fetch only at log points and once per epoch.
                epoch_losses.append(comps['loss'])
                epoch_skips.append(comps.get('skipped_nonfinite', 0.0))
                if self.writer and step % log_every == 0:
                    host_comps = jax.device_get(comps)
                    self.writer.add_scalar('batch/loss',
                                           float(host_comps['loss']), step)
                    for k, v in host_comps.items():
                        if k != 'loss':
                            self.writer.add_scalar(f'batch/{k}', float(v), step)
                step += 1

            if epoch_losses:
                host_losses = np.asarray(jax.device_get(epoch_losses))
                # non-finite batches are SKIPPED by the train step
                # (GradScaler parity, parallel/train_step.py) — the step's
                # own skipped_nonfinite flag is authoritative: it also
                # catches finite-loss/non-finite-GRADIENT steps (the AMP
                # overflow case) that loss finiteness alone misses
                host_skips = (np.asarray(jax.device_get(epoch_skips)) > 0.5)
                taken = ~host_skips & np.isfinite(host_losses)
                n_skipped = int(np.sum(~taken))
                mean_loss = (float(host_losses[taken].mean())
                             if taken.any() else float('nan'))
                if n_skipped:
                    print(f"epoch {epoch}: skipped {n_skipped} non-finite "
                          f"batch(es)", flush=True)
            else:
                mean_loss = float('nan')
            if self.writer:
                self.writer.add_scalar('epoch/train_loss', mean_loss, epoch)

            # validation loss (reference train.py:267-296)
            if self.val_loader is not None and epoch % self.val_every == 0:
                val_losses = []
                for batch in self.val_loader:
                    dev_batch = (batch_to_device_pair(batch) if self.takes_pair
                                 else batch_to_device_single(batch))
                    dev_batch = shard_batch(dev_batch, self.mesh)
                    with self.mesh:
                        vloss, _ = self.eval_step(self.state, dev_batch)
                    val_losses.append(vloss)   # stays on device (see above)
                val_mean = (float(np.mean(jax.device_get(val_losses)))
                            if val_losses else float('nan'))
                if self.writer:
                    self.writer.add_scalar('validation_loss', val_mean, epoch)
                print(f"epoch {epoch}: validation loss {val_mean:.4f}",
                      flush=True)
            print(f"epoch {epoch}: loss {mean_loss:.4f} "
                  f"({time.time()-t_epoch:.1f}s)", flush=True)

            if save_every and (epoch + 1) % save_every == 0:
                ckpt.save(self.output_dir, self.state, f'e{epoch + 1}',
                          epoch + 1)
        ckpt.save(self.output_dir, self.state, 'latest', n_epochs)
        return self.state
