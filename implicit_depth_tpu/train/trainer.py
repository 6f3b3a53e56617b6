"""Trainers: stage-1 LIDF and stage-2 Refine.

Parity: ``TrainLIDF`` (src/trainers/train_lidf.py:37-664) and ``TrainRefine``
(train_refine.py:36-663) — setup (dirs, auto log-name, config dump), model +
optimizer + checkpoint/resume, train/valid/test loops with meters, JSONL
epoch logs, per-image CSV at test, PLY/PNG visualization — re-shaped for
SPMD: no rank-0 gating (every host runs the same program; only process 0
writes files), no DDP wrapper, no consensus barriers.
"""

from __future__ import annotations

import csv
import json
import os
import os.path as osp
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.builder import build_lidf, build_refine, build_static
from implicit_depth_tpu.config import Config
from implicit_depth_tpu.data.datasets import get_dataset
from implicit_depth_tpu.data.loader import DataLoader
from implicit_depth_tpu.models.lidf import prepare_inputs
from implicit_depth_tpu.parallel.mesh import make_mesh, replicate
from implicit_depth_tpu.train.feed import DeviceFeeder, put_batch
from implicit_depth_tpu.train.checkpoint import Checkpointer, restore_params_only
from implicit_depth_tpu.train.metrics import (
    MeterBank,
    cleargrasp_metrics,
    depth_images_from_outputs,
)
from implicit_depth_tpu.train.state import TrainState, make_tx
from implicit_depth_tpu.train.steps import (
    make_lidf_eval_step,
    make_lidf_train_step,
    make_lidf_train_superstep,
    make_refine_eval_step,
    make_refine_train_step,
    make_refine_train_superstep,
)

VALID_SPLITS = (("cleargrasp_synthetic", "known"), ("cleargrasp_synthetic", "novel"),
                ("cleargrasp_real", "known"), ("cleargrasp_real", "novel"))

_LIDF_LOG_KEYS = ("loss_net", "pos_loss", "prob_loss", "acc", "err")
_REFINE_LOG_KEYS = ("loss_net", "pos_loss", "err")


def auto_log_name(cfg: Config, stage: str) -> str:
    """≙ the reference's hyperparameter-encoding run name
    (train_lidf.py:208-247)."""
    m, g, t, l = cfg.model, cfg.grid, cfg.training, cfg.loss
    parts = [
        stage, f"res{g.res}", f"miss{g.miss_sample_num}", f"valid{g.valid_sample_num}",
        f"bs{t.batch_size}", f"lr{t.lr}", m.offdec_type.lower(),
        f"rgb{m.rgb_out}", f"pnet{m.pnet_out}", f"posw{l.pos_w}",
        f"probw{l.prob_w}", f"snw{l.surf_norm_w}",
    ]
    if l.hard_neg:
        parts.append(f"hardneg{l.hard_neg_ratio}")
    if cfg.custom_postfix:
        parts.append(cfg.custom_postfix)
    return "_".join(str(p) for p in parts)


class BaseTrainer:
    stage = "base"

    def __init__(self, cfg: Config, workdir: Optional[str] = None):
        self.cfg = cfg
        self.is_main = jax.process_index() == 0
        # (data × rays) mesh over ALL devices: batch shards the data axis
        # (largest divisor of the per-host batch), remaining chips split the
        # ray dimension — no chip idles when batch < device count.
        # Multi-process policy (VERDICT r4 #7): the data split is computed
        # PER HOST (gcd of the per-host batch with the LOCAL device count)
        # and scaled by the process count, so the rays axis always stays
        # within a host (ICI) and only data-axis collectives cross DCN —
        # make_mesh's hosts-major grouping guarantees that layout.
        import math
        n_local = jax.local_device_count()
        n_procs = jax.process_count()
        per_host_batch = max(cfg.training.batch_size // n_procs, 1)
        n_data_local = math.gcd(per_host_batch, n_local)
        self.mesh = make_mesh((n_data_local * n_procs, n_local // n_data_local),
                              ("data", "rays"))
        self.per_host_batch = per_host_batch
        self.ray_sharded = self.mesh.shape["rays"] > 1
        self.key = jax.random.key(cfg.seed or 0)

        self.log_name = cfg.log_name or auto_log_name(cfg, self.stage)
        self.workdir = workdir or osp.join(cfg.base_log_dir or "logs", self.log_name)
        self.ckpt_dir = osp.join(self.workdir, "ckpt")
        self.vis_dir = osp.join(self.workdir, "vis")
        self.result_dir = osp.join(self.workdir, "result")
        if self.is_main:
            for d in (self.workdir, self.ckpt_dir, self.vis_dir, self.result_dir):
                os.makedirs(d, exist_ok=True)
            cfg.save(osp.join(self.workdir, "config.yaml"))
        self.ckpt = Checkpointer(self.ckpt_dir)
        self.meters = MeterBank()
        self.epoch_log_path = osp.join(self.workdir, "epoch_log.jsonl")
        self.valid_log_path = osp.join(self.workdir, "valid_log.txt")
        # best-metric scalars tracked across epochs AND resumes
        # (≙ train_lidf.py:85-112 min_err/max_acc/min_angle_err + :317-322)
        self.best = {"min_err": 1e5, "max_acc": -1.0, "min_angle_err": 1e5}

    def _update_best(self, record: Dict) -> bool:
        """Fold this epoch's metrics into the best scalars; returns True when
        the position error improved (triggers the best_network snapshot)."""
        src = record.get("valid") or {}
        if src:  # average the per-split validation means
            splits = list(src.values())
            agg = {k: float(np.mean([s[k] for s in splits if k in s]))
                   for k in splits[0]}
        else:
            agg = record.get("train", {})
        improved = False
        if "err" in agg and agg["err"] < self.best["min_err"]:
            self.best["min_err"] = agg["err"]
            improved = True
        if "acc" in agg and agg["acc"] > self.best["max_acc"]:
            self.best["max_acc"] = agg["acc"]
        if "angle_err" in agg and agg["angle_err"] < self.best["min_angle_err"]:
            self.best["min_angle_err"] = agg["angle_err"]
        return improved

    def _save_epoch(self, epoch: int, record: Dict) -> None:
        """Checkpoint + JSONL log for one epoch: latest every epoch, periodic
        snapshots, and a ``best_network`` copy when the tracked error improved
        (≙ train_lidf.py:317-371)."""
        improved = self._update_best(record)
        if self.is_main:
            meta = dict(self.best)
            self.ckpt.save(self.state, epoch, meta=meta,
                           snapshot=(epoch % self.cfg.training.nepoch_ckpt == 0))
            if improved:
                self.ckpt.save_as(self.state, epoch, "best_network", meta=meta)
        self.log_epoch(epoch, {**record, "best": dict(self.best)})

    def _should_validate(self, epoch: int) -> bool:
        """Reference: validate every epoch (train_lidf.py:292-315);
        ``training.valid_interval=N`` thins that to every Nth epoch past
        ``valid_start_epo`` (the last epoch always validates so best-metric
        tracking sees the final state) — useful when the valid pass rivals
        the train epoch at pod scale."""
        t = self.cfg.training
        if not t.do_valid or epoch < t.valid_start_epo:
            return False
        interval = int(t.get("valid_interval", 1) or 1)
        return (epoch == t.nepochs - 1
                or (epoch - t.valid_start_epo) % interval == 0)

    def _maybe_recycle(self, epoch: int) -> None:
        """Host-RSS recycle guard (``tpu.host_rss_exit_gb``): this image's
        remote-TPU PJRT plugin retains every device_put payload host-side
        (~12 MB/step at production shapes, measured scripts/probe_put_leak.py
        round 4) — a 60-epoch run OOMs near 10k steps. When current RSS
        crosses the limit, exit(82) right after the epoch checkpoint; an
        outer retry loop (scripts/run_disk_r4b.sh) restarts with
        resume=latest_network and the run continues where it left off.
        Default 0 = disabled (real PCIe-attached hosts don't leak)."""
        limit_gb = float(self.cfg.tpu.get("host_rss_exit_gb", 0) or 0)
        if not limit_gb:
            return
        try:
            with open("/proc/self/statm") as f:
                rss_gb = int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e9
        except (OSError, ValueError):
            return
        if rss_gb > limit_gb:
            print(f"[recycle] host RSS {rss_gb:.1f} GB > {limit_gb:.0f} GB "
                  f"after epoch {epoch} — exiting for a clean resume",
                  flush=True)
            raise SystemExit(82)

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # -- mid-epoch (preemption-safe) checkpointing ---------------------------
    def _apply_resume_meta(self, meta: Dict) -> int:
        """Digest a restored checkpoint's metadata: best scalars always; a
        mid-epoch snapshot (``step_in_epoch`` present) additionally restores
        the RNG key state and arms the step-skip so the interrupted epoch
        resumes at the exact optimizer step. Returns the epoch to start at."""
        self.best.update({k: meta[k] for k in self.best if k in meta})
        self._resume_skip_steps = 0
        if meta.get("step_in_epoch"):
            self._resume_skip_steps = int(meta["step_in_epoch"])
            if "key_data" in meta:
                self.key = jax.random.wrap_key_data(
                    np.asarray(meta["key_data"], np.uint32))
            start = int(meta["mid_epoch"])
            print(f"resumed MID-epoch {start} at step "
                  f"{self._resume_skip_steps} (best {self.best})")
            return start
        start = int(meta.get("epoch", -1)) + 1
        print(f"resumed from epoch {start - 1} (best {self.best})")
        return start

    def _maybe_step_ckpt(self, epoch: int, steps_done: int) -> None:
        """Write latest_network mid-epoch every ``ckpt_every_steps`` optimizer
        steps (superstep granularity: saves land on dispatch boundaries).
        Meta records the in-progress epoch, the step count, and the RNG key
        so ``_apply_resume_meta`` restores the exact loop position; the
        epoch-end save overwrites with step-free meta. Meters restart on a
        mid-epoch resume, so that epoch's logged means cover the remainder."""
        every = int(self.cfg.training.get("ckpt_every_steps", 0) or 0)
        if not (every and self.is_main):
            return
        prev = getattr(self, "_last_step_ckpt", 0)
        if steps_done // every <= prev // every:
            return
        self._last_step_ckpt = steps_done
        meta = dict(self.best, mid_epoch=epoch, step_in_epoch=steps_done,
                    key_data=np.asarray(
                        jax.random.key_data(self.key)).tolist())
        self.ckpt.save(self.state, epoch - 1, meta=meta, snapshot=False)

    # -- data ---------------------------------------------------------------
    def make_train_loader(self) -> DataLoader:
        """Per-host loader slice. ``training.batch_size`` is the GLOBAL batch
        (≙ the reference's per-rank ``batch_size/ngpus``, train_lidf.py:
        162-175): each host loads ``per_host_batch`` samples per step and the
        feed assembles them into the global batch (feed.put_batch)."""
        cfg = self.cfg
        ds = get_dataset(cfg.dataset, "train", base_seed=cfg.seed or 0)
        return DataLoader(ds, self.per_host_batch, shuffle=True,
                          seed=cfg.seed or 0, num_workers=cfg.training.num_workers,
                          host_id=jax.process_index(), num_hosts=jax.process_count(),
                          worker_type=cfg.training.get("worker_type", "thread"))

    def make_valid_loaders(self) -> Dict[str, DataLoader]:
        cfg = self.cfg
        out = {}
        if cfg.dataset.type == "synthetic":
            ds = get_dataset(cfg.dataset, "valid")
            out["synthetic"] = DataLoader(ds, cfg.training.valid_batch_size,
                                          shuffle=False, num_workers=2)
            return out
        for dtype, obj in VALID_SPLITS:
            try:
                sub = Config(cfg.dataset.to_dict())
                sub.type = dtype
                ds = get_dataset(sub, "valid", obj_type=obj)
                if len(ds):
                    out[f"{dtype.split('_')[-1]}_{obj}"] = DataLoader(
                        ds, cfg.training.valid_batch_size, shuffle=False,
                        num_workers=2)
            except (FileNotFoundError, OSError):
                continue
        return out

    def log_epoch(self, epoch: int, record: Dict) -> None:
        if not self.is_main:
            return
        with open(self.epoch_log_path, "a") as f:
            f.write(json.dumps({"epoch": epoch, **record}) + "\n")

    def _train_steps_per_call(self) -> int:
        """Optimizer steps per device call (tpu.train_steps_per_call): K>1
        scans K steps in ONE jit dispatch over a stacked feed buffer.
        Forced to 1 when per-step host batches are needed (debug truncation,
        train-time visualization)."""
        cfg = self.cfg
        if cfg.debug or cfg.training.get("train_vis_iter", 0):
            return 1
        return max(int(cfg.tpu.get("train_steps_per_call", 1) or 1), 1)

    def _train_feed(self, epoch: int, skip_steps: int = 0):
        """Packed, background-threaded host→device feed (train/feed.py):
        ONE device_put per batch (or per K-step superbatch) instead of ~10,
        xyz derived on device when the dataset allows, pack work overlapped
        with the device step."""
        if not hasattr(self, "_feeder"):
            self._feeder = DeviceFeeder(
                self.train_loader, self.mesh, "data",
                steps_per_call=self._train_steps_per_call())
        return self._feeder.epoch(epoch, skip_steps=skip_steps)

    def _run_train_epoch(self, epoch: int, run_one, run_super, tag: str,
                         log_keys) -> Dict[str, float]:
        """Shared train-epoch driver. ``run_one(batch)`` executes a single
        step; ``run_super(buf, spec)`` a scanned K-step superbatch (losses
        come back stacked (K,) and are harvested per step). Loss readback is
        one item LATE so the device pipeline stays full."""
        cfg = self.cfg
        self.meters.reset()
        t_start = time.time()
        phases = {"feed_wait": 0.0, "dispatch": 0.0, "harvest": 0.0}
        pending = None
        skip = getattr(self, "_resume_skip_steps", 0)
        self._resume_skip_steps = 0  # only the interrupted epoch skips
        self._last_step_ckpt = skip
        it = skip - 1
        feed = iter(self._train_feed(epoch, skip_steps=skip))
        while True:
            t0 = time.perf_counter()
            item = next(feed, None)
            phases["feed_wait"] += time.perf_counter() - t0
            if item is None or (cfg.debug and it >= 4):
                break
            t0 = time.perf_counter()
            if isinstance(item, tuple) and item[0] == "super":
                _, buf, spec, k = item
                losses = run_super(buf, spec)
                first = it + 1
                it += k
                batch = None
            else:
                batch = item[1] if isinstance(item, tuple) else item
                batch.pop("item_path", None)
                losses = run_one(batch)
                first = it = it + 1
            phases["dispatch"] += time.perf_counter() - t0
            if batch is not None:
                self._train_vis(epoch, it, batch)
            if pending is not None:  # harvest the PREVIOUS item (overlapped)
                t0 = time.perf_counter()
                self._harvest_losses(epoch, pending, tag, log_keys)
                phases["harvest"] += time.perf_counter() - t0
            pending = (first, losses)
            self._maybe_step_ckpt(epoch, it + 1)
        if pending is not None:
            t0 = time.perf_counter()
            self._harvest_losses(epoch, pending, tag, log_keys)
            phases["harvest"] += time.perf_counter() - t0
        means = self.meters.means()
        means["epoch_time_s"] = time.time() - t_start
        if os.environ.get("IDT_TIMING") and self.is_main:
            # harvest(last) is where the queued device work drains, so it
            # reads as "device time the host could not overlap"
            print(f"[timing] epoch {epoch} " + " ".join(
                f"{k}={v:.2f}s" for k, v in phases.items()), flush=True)
        return means

    def _eval_put(self, batch, loader):
        """Replicated device copy of an eval batch via the packed path; the
        host ``batch`` stays available for metric/CSV/vis work."""
        derive = bool(getattr(loader.dataset, "xyz_from_depth", False))
        return put_batch({k: v for k, v in batch.items() if k != "item_path"},
                         self.mesh, axis=None, derive_xyz=derive)

    def _harvest_losses(self, epoch: int, pending, tag: str, log_keys) -> None:
        """Read back one item's loss scalars — a single step (scalars) or a
        scanned superbatch (values stacked (K,)). Called one item LATE (after
        the next has been dispatched): per-step ``float()`` readbacks are a
        host⇄device round-trip each — through this image's remote-TPU relay
        that is ≥25 ms of dead device time per scalar dict. A single delayed
        ``device_get`` keeps the device pipeline full and fetches the dict in
        one transfer."""
        it0, losses = pending
        host = {k: np.atleast_1d(np.asarray(v))
                for k, v in jax.device_get(losses).items()}
        n = max(a.shape[0] for a in host.values())
        for j in range(n):
            vals = {k: float(a[j] if a.shape[0] > 1 else a[0])
                    for k, a in host.items()}
            self.meters.add(vals)
            if self.is_main and (it0 + j) % self.cfg.training.log_interval == 0:
                msg = " ".join(f"{k}={v:.4f}" for k, v in vals.items()
                               if k in log_keys)
                print(f"[{tag}] epoch {epoch} it {it0 + j}/"
                      f"{self.steps_per_epoch} {msg}", flush=True)


class LIDFTrainer(BaseTrainer):
    """Stage 1 (≙ TrainLIDF)."""

    stage = "lidf"

    def __init__(self, cfg: Config, workdir: Optional[str] = None):
        super().__init__(cfg, workdir)
        self.static = build_static(cfg)
        self.model = build_lidf(cfg, self.static)
        h, w = cfg.dataset.img_height, cfg.dataset.img_width
        self.eval_static = build_static(cfg, n_rays=h * w)
        self.eval_model = build_lidf(cfg, self.eval_static)

        self.train_loader = self.make_train_loader()
        self.steps_per_epoch = max(self.train_loader.steps_per_epoch(), 1)
        self.tx = make_tx(cfg.training, self.steps_per_epoch)
        self.state = self._init_state()
        self.start_epoch = 0
        if cfg.resume and self.ckpt.latest_exists():
            self.state, meta = self.ckpt.restore(self.state)
            self.start_epoch = self._apply_resume_meta(meta)
        elif cfg.checkpoint_path:
            # load initial weights from an external run (≙ train_lidf.py:73-92)
            params, bstats = restore_params_only(
                cfg.checkpoint_path,
                {"params": self.state.params, "batch_stats": self.state.batch_stats},
                name=cfg.get("checkpoint_name", "latest_network"))
            self.state = self.state.replace(params=params, batch_stats=bstats)
            print(f"loaded weights from {cfg.checkpoint_path}")
        if jax.process_count() > 1:
            # multi-process restores come back as host-local leaves
            # (checkpoint.py takes the collective-free raw path) — put them
            # back onto the global mesh
            self.state = replicate(self.state, self.mesh)

        self.train_step = make_lidf_train_step(cfg, self.model, mesh=self.mesh)
        self.train_superstep = make_lidf_train_superstep(cfg, self.model,
                                                         mesh=self.mesh)
        # eval (batch 1): ALL chips split the per-pixel rays
        self.eval_step = make_lidf_eval_step(cfg, self.eval_model,
                                             ray_axis=("data", "rays"),
                                             mesh=self.mesh)
        self._vis_step = None  # train-shape vis forward, built on first use

    def _train_vis(self, epoch: int, it: int, batch) -> None:
        """Train-time visualization (≙ train_lidf.py:469-473): dump visuals
        ``train_vis_iter`` times per epoch on the current training batch."""
        vis_iter = self.cfg.training.get("train_vis_iter", 0)
        if not (self.is_main and vis_iter):
            return
        period = max(self.steps_per_epoch // int(vis_iter), 1)
        if it % period != 0:
            return
        if self._vis_step is None:
            from implicit_depth_tpu.train.steps import make_lidf_vis_step
            self._vis_step = make_lidf_vis_step(self.cfg, self.model)
        inputs, pred = self._vis_step(self.state, batch, self._next_key())
        from implicit_depth_tpu.train.visualize import dump_batch_visuals
        dump_batch_visuals(self.vis_dir, f"train_ep{epoch}_it{it}",
                           {k: np.asarray(v) for k, v in batch.items()},
                           inputs, np.asarray(pred))

    def _init_state(self) -> TrainState:
        batch = next(iter(self.train_loader.epoch(0)))
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "item_path"}
        inputs = jax.jit(lambda b, k: prepare_inputs(
            self.static, b, k, train=True))(batch, self._next_key())
        variables = jax.jit(lambda k, i: self.model.init(
            k, i, train=False, use_gt_label=True))(self._next_key(), inputs)
        state = TrainState.create(variables["params"], variables["batch_stats"], self.tx)
        return replicate(state, self.mesh)

    # -- loops --------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        ep = jnp.asarray(epoch)

        def run_one(batch):
            self.state, losses = self.train_step(
                self.state, batch, self._next_key(), ep)
            return losses

        def run_super(buf, spec):
            self.state, losses = self.train_superstep(
                self.state, buf, self._next_key(), ep, spec=spec)
            return losses

        return self._run_train_epoch(epoch, run_one, run_super,
                                     "lidf", _LIDF_LOG_KEYS)

    def validate(self, epoch: int, max_batches: Optional[int] = None) -> Dict[str, Dict]:
        cfg = self.cfg
        results = {}
        h, w = cfg.dataset.img_height, cfg.dataset.img_width
        for split, loader in self.make_valid_loaders().items():
            bank = MeterBank()
            for it, batch in enumerate(loader.epoch(0)):
                if cfg.debug and it >= 5:
                    break
                if max_batches and it >= max_batches:
                    break
                batch.pop("item_path", None)
                jbatch = self._eval_put(batch, loader)
                inputs, out, losses = self.eval_step(self.state, jbatch,
                                                     self._next_key())
                bank.add({k: float(v) for k, v in losses.items()})
                pred_depth = depth_images_from_outputs(inputs, out["pred_pos"], h, w)
                for i in range(pred_depth.shape[0]):
                    m = cleargrasp_metrics(pred_depth[i],
                                           np.asarray(batch["depth"][i]),
                                           np.asarray(batch["corrupt_mask"][i]))
                    if m:
                        bank.add(m)
                vis_iter = cfg.training.get("val_vis_iter", 0)
                if self.is_main and vis_iter and it % vis_iter == 0:
                    from implicit_depth_tpu.train.visualize import dump_batch_visuals
                    dump_batch_visuals(self.vis_dir, f"{split}_ep{epoch}_it{it}",
                                       batch, inputs, np.asarray(out["pred_pos"]))
            results[split] = bank.means()
            if self.is_main:
                line = f"epoch {epoch} split {split} " + " ".join(
                    f"{k}={v:.4f}" for k, v in sorted(results[split].items()))
                with open(self.valid_log_path, "a") as f:
                    f.write(line + "\n")
                print(line, flush=True)
        return results

    def test(self, split_loaders=None) -> None:
        """Per-image CSV ≙ train_lidf.py:625-664."""
        cfg = self.cfg
        h, w = cfg.dataset.img_height, cfg.dataset.img_width
        loaders = split_loaders or self.make_valid_loaders()
        vis_iter = cfg.training.get("test_vis_iter", 0)
        for split, loader in loaders.items():
            rows = []
            for it, batch in enumerate(loader.epoch(0)):
                paths = batch.pop("item_path")
                jbatch = self._eval_put(batch, loader)
                inputs, out, _ = self.eval_step(self.state, jbatch, self._next_key())
                if self.is_main and vis_iter and it % vis_iter == 0:
                    # ≙ test-time vis_cond2 (train_lidf.py:471-473)
                    from implicit_depth_tpu.train.visualize import dump_batch_visuals
                    dump_batch_visuals(self.vis_dir, f"test_{split}_it{it}",
                                       batch, inputs, np.asarray(out["pred_pos"]))
                pred_depth = depth_images_from_outputs(inputs, out["pred_pos"], h, w)
                for i in range(pred_depth.shape[0]):
                    m = cleargrasp_metrics(pred_depth[i],
                                           np.asarray(batch["depth"][i]),
                                           np.asarray(batch["corrupt_mask"][i]))
                    if m:
                        rows.append([paths[i], m["rmse"], m["abs_rel"], m["mae"],
                                     m["a1"], m["a2"], m["a3"]])
            if self.is_main and rows:
                path = osp.join(self.result_dir, f"{split}.csv")
                with open(path, "w", newline="") as f:
                    wcsv = csv.writer(f)
                    wcsv.writerow(["Image Num", "RMSE", "REL", "MAE",
                                   "Delta 1.05", "Delta 1.10", "Delta 1.25"])
                    wcsv.writerows(rows)
                    arr = np.asarray([r[1:] for r in rows], np.float64)
                    wcsv.writerow(["MEAN", *arr.mean(0).tolist()])
                print(f"wrote {path} ({len(rows)} images)", flush=True)

    def run(self) -> None:
        cfg = self.cfg
        for epoch in range(self.start_epoch, cfg.training.nepochs):
            train_means = self.train_epoch(epoch)
            record = {"train": train_means}
            if self._should_validate(epoch):
                record["valid"] = self.validate(epoch)
            self._save_epoch(epoch, record)
            self._maybe_recycle(epoch)


class RefineTrainer(BaseTrainer):
    """Stage 2 (≙ TrainRefine): frozen LIDF + refine net."""

    stage = "refine"

    def __init__(self, cfg: Config, workdir: Optional[str] = None,
                 lidf_variables=None):
        super().__init__(cfg, workdir)
        self.static = build_static(cfg)
        self.lidf_model = build_lidf(cfg, self.static)
        self.refine_model = build_refine(cfg, self.static)
        h, w = cfg.dataset.img_height, cfg.dataset.img_width
        self.eval_static = build_static(cfg, n_rays=h * w)
        self.eval_lidf = build_lidf(cfg, self.eval_static)
        self.eval_refine = build_refine(cfg, self.eval_static)

        self.train_loader = self.make_train_loader()
        self.steps_per_epoch = max(self.train_loader.steps_per_epoch(), 1)
        self.tx = make_tx(cfg.training, self.steps_per_epoch)

        batch = next(iter(self.train_loader.epoch(0)))
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "item_path"}
        inputs = jax.jit(lambda b, k: prepare_inputs(
            self.static, b, k, train=True))(batch, self._next_key())

        # frozen stage-1 weights (train_refine.py:60-73)
        if lidf_variables is None:
            lidf_variables = jax.jit(lambda k, i: self.lidf_model.init(
                k, i, train=False, use_gt_label=True))(self._next_key(), inputs)
            if cfg.lidf_ckpt_path:
                params, bstats = restore_params_only(
                    cfg.lidf_ckpt_path, lidf_variables,
                    name=cfg.get("lidf_ckpt_name", "latest_network"))
                lidf_variables = {"params": params, "batch_stats": bstats}
        self.lidf_variables = replicate(lidf_variables, self.mesh)

        lidf_out = jax.jit(lambda v, i: self.lidf_model.apply(
            v, i, train=False, use_gt_label=True))(lidf_variables, inputs)
        rvars = jax.jit(lambda k, i, o: self.refine_model.init(
            k, i, o, o["pred_pos"]))(self._next_key(), inputs, lidf_out)
        self.state = replicate(
            TrainState.create(rvars["params"], {}, self.tx), self.mesh)
        self.start_epoch = 0
        if cfg.resume and self.ckpt.latest_exists():
            self.state, meta = self.ckpt.restore(self.state)
            self.start_epoch = self._apply_resume_meta(meta)
        elif cfg.checkpoint_path:
            params, _ = restore_params_only(
                cfg.checkpoint_path, {"params": self.state.params,
                                      "batch_stats": {}},
                name=cfg.get("checkpoint_name", "latest_network"))
            self.state = self.state.replace(params=params)
            print(f"loaded refine weights from {cfg.checkpoint_path}")
        if jax.process_count() > 1:
            self.state = replicate(self.state, self.mesh)  # see LIDFTrainer

        self.train_step = make_refine_train_step(cfg, self.lidf_model,
                                                 self.refine_model,
                                                 mesh=self.mesh)
        self.train_superstep = make_refine_train_superstep(
            cfg, self.lidf_model, self.refine_model, mesh=self.mesh)
        self.eval_step = make_refine_eval_step(cfg, self.eval_lidf,
                                               self.eval_refine,
                                               ray_axis=("data", "rays"),
                                               mesh=self.mesh)
        self._vis_step = None

    def _train_vis(self, epoch: int, it: int, batch) -> None:
        """≙ train_refine.py:430-482 train-time visualization."""
        vis_iter = self.cfg.training.get("train_vis_iter", 0)
        if not (self.is_main and vis_iter):
            return
        period = max(self.steps_per_epoch // int(vis_iter), 1)
        if it % period != 0:
            return
        if self._vis_step is None:
            from implicit_depth_tpu.train.steps import make_refine_vis_step
            self._vis_step = make_refine_vis_step(self.cfg, self.lidf_model,
                                                  self.refine_model)
        inputs, pred = self._vis_step(self.state, self.lidf_variables, batch,
                                      self._next_key())
        from implicit_depth_tpu.train.visualize import dump_batch_visuals
        dump_batch_visuals(self.vis_dir, f"train_ep{epoch}_it{it}",
                           {k: np.asarray(v) for k, v in batch.items()},
                           inputs, np.asarray(pred))

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        ep = jnp.asarray(epoch)

        def run_one(batch):
            self.state, losses = self.train_step(
                self.state, self.lidf_variables, batch, self._next_key(), ep)
            return losses

        def run_super(buf, spec):
            self.state, losses = self.train_superstep(
                self.state, self.lidf_variables, buf, self._next_key(), ep,
                spec=spec)
            return losses

        return self._run_train_epoch(epoch, run_one, run_super,
                                     "refine", _REFINE_LOG_KEYS)

    def validate(self, epoch: int, max_batches: Optional[int] = None) -> Dict[str, Dict]:
        cfg = self.cfg
        h, w = cfg.dataset.img_height, cfg.dataset.img_width
        results = {}
        for split, loader in self.make_valid_loaders().items():
            bank = MeterBank()
            for it, batch in enumerate(loader.epoch(0)):
                if cfg.debug and it >= 5:
                    break
                if max_batches and it >= max_batches:
                    break
                batch.pop("item_path", None)
                jbatch = self._eval_put(batch, loader)
                inputs, lidf_out, pred, losses = self.eval_step(
                    self.state, self.lidf_variables, jbatch, self._next_key())
                bank.add({k: float(v) for k, v in losses.items()})
                pred_depth = depth_images_from_outputs(inputs, pred, h, w)
                for i in range(pred_depth.shape[0]):
                    m = cleargrasp_metrics(pred_depth[i],
                                           np.asarray(batch["depth"][i]),
                                           np.asarray(batch["corrupt_mask"][i]))
                    if m:
                        bank.add(m)
                vis_iter = cfg.training.get("val_vis_iter", 0)
                if self.is_main and vis_iter and it % vis_iter == 0:
                    from implicit_depth_tpu.train.visualize import dump_batch_visuals
                    dump_batch_visuals(self.vis_dir, f"{split}_ep{epoch}_it{it}",
                                       batch, inputs, np.asarray(pred))
            results[split] = bank.means()
            if self.is_main:
                line = f"epoch {epoch} split {split} " + " ".join(
                    f"{k}={v:.4f}" for k, v in sorted(results[split].items()))
                with open(self.valid_log_path, "a") as f:
                    f.write(line + "\n")
                print(line, flush=True)
        return results

    def test(self, split_loaders=None) -> None:
        """Two-stage per-image CSV (≙ train_refine.py:625-664)."""
        cfg = self.cfg
        h, w = cfg.dataset.img_height, cfg.dataset.img_width
        loaders = split_loaders or self.make_valid_loaders()
        import csv
        vis_iter = cfg.training.get("test_vis_iter", 0)
        for split, loader in loaders.items():
            rows = []
            for it, batch in enumerate(loader.epoch(0)):
                paths = batch.pop("item_path")
                jbatch = self._eval_put(batch, loader)
                inputs, _, pred, _ = self.eval_step(
                    self.state, self.lidf_variables, jbatch, self._next_key())
                if self.is_main and vis_iter and it % vis_iter == 0:
                    from implicit_depth_tpu.train.visualize import dump_batch_visuals
                    dump_batch_visuals(self.vis_dir, f"test_{split}_it{it}",
                                       batch, inputs, np.asarray(pred))
                pred_depth = depth_images_from_outputs(inputs, pred, h, w)
                for i in range(pred_depth.shape[0]):
                    m = cleargrasp_metrics(pred_depth[i],
                                           np.asarray(batch["depth"][i]),
                                           np.asarray(batch["corrupt_mask"][i]))
                    if m:
                        rows.append([paths[i], m["rmse"], m["abs_rel"], m["mae"],
                                     m["a1"], m["a2"], m["a3"]])
            if self.is_main and rows:
                path = osp.join(self.result_dir, f"{split}.csv")
                with open(path, "w", newline="") as f:
                    wcsv = csv.writer(f)
                    wcsv.writerow(["Image Num", "RMSE", "REL", "MAE",
                                   "Delta 1.05", "Delta 1.10", "Delta 1.25"])
                    wcsv.writerows(rows)
                    arr = np.asarray([r[1:] for r in rows], np.float64)
                    wcsv.writerow(["MEAN", *arr.mean(0).tolist()])
                print(f"wrote {path} ({len(rows)} images)", flush=True)

    def run(self) -> None:
        cfg = self.cfg
        for epoch in range(self.start_epoch, cfg.training.nepochs):
            train_means = self.train_epoch(epoch)
            record = {"train": train_means}
            if self._should_validate(epoch):
                record["valid"] = self.validate(epoch)
            self._save_epoch(epoch, record)
            self._maybe_recycle(epoch)


TRAINERS = {"lidf": LIDFTrainer, "refine": RefineTrainer}
