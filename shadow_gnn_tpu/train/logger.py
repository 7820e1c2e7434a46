"""Run logging, CSV protocol, windowed best-model tracking, checkpoints.

Covers the reference ``shaDow/logging_base.py`` surface: per-epoch CSV
files ``epoch_{train,valid,test}.csv`` + single-row ``final.csv``, the
sliding-window best-model selection with representative-epoch choice
(center / last / best_<metric>, :274-310), checkpoint save/restore, the
"FINAL SUMMARY:" stdout contract consumed by the multi-run wrapper
(:496-501), and run-dir status moves running -> finished/killed/crashed
(:494-533).  Checkpoints serialize flax param/optimizer pytrees via
msgpack instead of torch.save.
"""
from __future__ import annotations

import os
import shutil
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import yaml
from flax import serialization

from shadow_gnn_tpu import MODE2STR, TRAIN, VALID, TEST
from shadow_gnn_tpu.train.metrics import Metrics


class Logger:
    def __init__(self, metrics: Metrics, dir_log: str, *,
                 term_window_size: int = 1, term_window_aggr: str = "center",
                 timestamp: Optional[str] = None, no_log: bool = False,
                 config_dump: Optional[dict] = None):
        self.metrics = metrics
        self.no_log = no_log
        self.dir_log = dir_log
        self.timestamp = timestamp or time.strftime("%Y-%m-%d %H-%M-%S")
        self.window_size = term_window_size
        self.window_aggr = term_window_aggr
        assert term_window_aggr in ("center", "last") or \
            term_window_aggr.startswith("best")
        if not no_log:
            os.makedirs(dir_log, exist_ok=True)
            if config_dump is not None:
                with open(f"{dir_log}/config.yml", "w") as f:
                    yaml.dump(config_dump, f, default_flow_style=False,
                              sort_keys=False)
        # per-mode per-epoch histories
        self.epoch_stats: Dict[int, List[Dict[str, float]]] = {
            TRAIN: [], VALID: [], TEST: []}
        # most recent TRAIN epoch index — VALID/TEST csv rows are
        # annotated with it (reference logging_base.py:438-442)
        self._train_epoch = -1
        self._final_header_done = False
        # windowed best tracking over VALID
        self.loss_min_hist = float("inf")
        self.metric_max_hist = float("-inf")
        self.best_epoch = -1
        self._window: List[Any] = []    # [(epoch, host_params, host_opt)]
        self.best_state = None          # (epoch, params, opt_state)
        self.final_stats: Dict[int, Dict[str, float]] = {}

    # ---------------- CSV protocol ----------------
    def _csv_path(self, mode):
        return f"{self.dir_log}/epoch_{MODE2STR[mode]}.csv"

    def log_epoch(self, mode: int, epoch: int, stats: Dict[str, float],
                  status: str = "running", time_s: float = 0.0):
        self.epoch_stats[mode].append(dict(stats))
        mstr = " / ".join(f"{k} = {v:.5f}" for k, v in stats.items())
        print(f"[{MODE2STR[mode]:^5s}] ep {epoch:4d} ({status}): {mstr}"
              f"  ({time_s:.2f}s)")
        if status == "running" and mode == TRAIN:
            self._train_epoch = epoch
        if self.no_log or status != "running":
            return
        # reference epoch-CSV protocol (logging_base.py:398-404,436-442):
        # header 'epoch, {mode}_loss, {mode}_{metric}...'; TRAIN rows lead
        # with the epoch index, VALID/TEST rows annotate it with the
        # train epoch they interleave: '{e:4d} ({train_e:4d})'
        path = self._csv_path(mode)
        ms = MODE2STR[mode]
        keys = [k for k in stats if k != "loss"]
        with open(path, "a") as f:
            if f.tell() == 0:
                f.write(f"epoch, {ms}_loss, "
                        + ", ".join(f"{ms}_{k}" for k in keys) + "\n")
            if mode == TRAIN:
                head = f"{epoch:4d}"
            else:
                head = f"{epoch:4d} ({self._train_epoch:4d})"
            f.write(head + ", " + f"{stats['loss']:.5f}, "
                    + ", ".join(f"{stats[k]:.5f}" for k in keys) + "\n")

    def log_final(self, mode: int, stats: Dict[str, float]):
        self.final_stats[mode] = dict(stats)
        if self.no_log:
            return
        # reference final-CSV protocol (logging_base.py:404-409,443-454):
        # ONE header row spanning train/valid/test columns, then ONE data
        # row assembled incrementally ('," "' fragments for train/valid,
        # newline after test)
        path = f"{self.dir_log}/final.csv"
        keys = [k for k in stats if k != "loss"]
        with open(path, "a") as f:
            if not self._final_header_done and f.tell() == 0:
                f.write(", ".join(
                    f"{MODE2STR[m]}_loss, "
                    + ", ".join(f"{MODE2STR[m]}_{k}" for k in keys)
                    for m in (TRAIN, VALID, TEST)) + "\n")
                self._final_header_done = True
            frag = (f"{stats['loss']:.5f}, "
                    + ", ".join(f"{stats[k]:.5f}" for k in keys))
            f.write(frag + ("\n" if mode == TEST else ", "))

    def final_summary(self):
        """The machine-readable line scraped by the multi-run wrapper
        (logging_base.py:496-501 <-> train_multiple_runs.py:53-59)."""
        parts = []
        for mode in (TRAIN, VALID, TEST):
            if mode in self.final_stats:
                s = self.final_stats[mode]
                parts.append(f"{MODE2STR[mode]}: " + ", ".join(
                    f"{k}={v:.5f}" for k, v in s.items()))
        line = f"FINAL SUMMARY: best epoch {self.best_epoch} | " + " | ".join(parts)
        print(line)
        return line

    # ---------------- best-model window ----------------
    def update_best_model(self, epoch: int, params, opt_state) -> bool:
        """Track a sliding window of host-copied states; when the
        window-averaged validation metric improves, elect the window's
        representative (logging_base.py:274-310)."""
        key = self.metrics.metric_term[0]
        valid_hist = self.epoch_stats[VALID]
        loss_all = [s["loss"] for s in valid_hist]
        metric_all = [s[key] for s in valid_hist]
        host_state = (epoch, jax.device_get(params), jax.device_get(opt_state))
        self._window.append(host_state)
        if len(self._window) > self.window_size:
            self._window.pop(0)
        better, self.loss_min_hist, self.metric_max_hist = \
            self.metrics.is_better(loss_all, self.loss_min_hist,
                                   metric_all, self.metric_max_hist)
        if better and len(self._window) == min(self.window_size, len(valid_hist)):
            if self.window_aggr == "center":
                pick = len(self._window) // 2
            elif self.window_aggr == "last":
                pick = len(self._window) - 1
            else:                                  # best_<metric> in window
                win_metrics = metric_all[-len(self._window):]
                pick = int(np.argmax(win_metrics))
            self.best_state = self._window[pick]
            self.best_epoch = self.best_state[0]
            self.save_checkpoint(self.best_state[1], self.best_state[2])
        return better

    # ---------------- checkpointing ----------------
    def _ckpt_paths(self):
        ts = self.timestamp.replace(" ", "_")
        return (f"{self.dir_log}/saved_model_{ts}.msgpack",
                f"{self.dir_log}/saved_optimizer_{ts}.msgpack")

    def save_checkpoint(self, params, opt_state):
        if self.no_log:
            return
        pm, po = self._ckpt_paths()
        with open(pm, "wb") as f:
            f.write(serialization.to_bytes(params))
        with open(po, "wb") as f:
            f.write(serialization.to_bytes(opt_state))

    def restore_model(self, params_template, opt_template=None):
        """Return best (params, opt_state): from the in-memory window
        state if present, else from the saved checkpoint file."""
        if self.best_state is not None:
            return self.best_state[1], self.best_state[2]
        pm, po = self._ckpt_paths()
        return self.load_checkpoint(params_template, opt_template, pm, po)

    @staticmethod
    def load_checkpoint(params_template, opt_template, path_model,
                        path_opt=None):
        import glob as _glob
        if "*" in path_model:
            path_model = sorted(_glob.glob(path_model))[0]
        with open(path_model, "rb") as f:
            params = serialization.from_bytes(params_template, f.read())
        opt_state = None
        if opt_template is not None and path_opt:
            if "*" in path_opt:
                path_opt = sorted(_glob.glob(path_opt))[0]
            with open(path_opt, "rb") as f:
                opt_state = serialization.from_bytes(opt_template, f.read())
        return params, opt_state

    def record_loaded_checkpoint(self, path_model, path_opt=None):
        """Copy a cross-run loaded checkpoint into this run dir for
        provenance (reference load_model, logging_base.py:340-361)."""
        if self.no_log:
            return []
        os.makedirs(self.dir_log, exist_ok=True)
        dests = []
        for p in (path_model, path_opt):
            if p and os.path.isfile(p):
                d = f"{self.dir_log}/loaded_{os.path.basename(p)}"
                shutil.copy2(p, d)
                dests.append(d)
        return dests

    def save_tensor(self, arr, fname: str):
        if self.no_log:
            return None
        path = f"{self.dir_log}/{fname.format(self.timestamp.replace(' ', '_'))}"
        np.save(path, np.asarray(arr))
        return path

    def validate_result(self):
        """Self-check like InfoEpoch.assert_valid (logging_base.py:
        126-160): recompute the window-best validation metric with an
        independent unfold and compare to the incremental tracker."""
        key = self.metrics.metric_term[0]
        hist = [s[key] for s in self.epoch_stats[VALID]]
        if not hist:
            return True
        w = self.window_size
        best = max(sum(hist[max(0, i + 1 - w):i + 1])
                   / len(hist[max(0, i + 1 - w):i + 1])
                   for i in range(len(hist)))
        assert abs(best - self.metric_max_hist) < 1e-9, (
            f"window tracker mismatch: {best} vs {self.metric_max_hist}")
        return True

    # ---------------- run-dir lifecycle ----------------
    def end_training(self, status: str):
        """Move the run dir running/ -> finished|killed|crashed
        (logging_base.py:494-533)."""
        self.final_summary()
        if self.no_log or "/running/" not in self.dir_log:
            return self.dir_log
        dest = self.dir_log.replace("/running/", f"/{status}/")
        os.makedirs(os.path.dirname(dest.rstrip("/")), exist_ok=True)
        shutil.move(self.dir_log, dest)
        self.dir_log = dest
        return dest
