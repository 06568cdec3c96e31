"""Metrics, logging, and profiling hooks.

The reference's observability is stdout prints + an AverageMeter
(utils.py:17-32, SURVEY.md §5).  Reproduced here, plus structured JSONL
logging and a jax.profiler trace context the reference lacks.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass
from typing import Optional


class AverageMeter:
    """Running average (reference utils.py:17-32)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def adjust_learning_rate(epoch: int, lr: float = 0.01, step1: int = 30, step2: int = 60, step3: int = 90) -> float:
    """Step LR decay schedule (reference utils.py:4-15) as a pure function;
    feed it to optax.inject_hyperparams or a manual scale."""
    if epoch >= step3:
        return lr * 0.001
    if epoch >= step2:
        return lr * 0.01
    if epoch >= step1:
        return lr * 0.1
    return lr


@dataclass
class MetricLogger:
    """stdout prints (reference format) + optional JSONL file."""

    jsonl_path: Optional[str] = None
    print_freq: int = 10  # meta_template.py:59

    def log_train(self, epoch: int, batch: int, n_batches: int, avg_loss: float, **extra):
        if batch % self.print_freq == 0:
            print(f"Epoch {epoch:d} | Batch {batch:d}/{n_batches:d} | Loss {avg_loss:f}")
        self._write({"kind": "train", "epoch": epoch, "batch": batch, "loss": avg_loss, **extra})

    def log_eval(self, n_episodes: int, acc_mean: float, ci95: float, **extra):
        # reference meta_template.py:149 / finetune.py:682 format
        print("%d Test Acc = %4.2f%% +- %4.2f%%" % (n_episodes, acc_mean, ci95))
        self._write({"kind": "eval", "episodes": n_episodes, "acc_mean": acc_mean, "ci95": ci95, **extra})

    def _write(self, rec: dict):
        if self.jsonl_path:
            os.makedirs(os.path.dirname(self.jsonl_path) or ".", exist_ok=True)
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec) + "\n")


def sparsity(cl_data_file: dict) -> float:
    """Mean per-class count of nonzero feature entries
    (reference utils.py:38-43)."""
    import numpy as np

    per_class = [np.mean([np.sum(x != 0) for x in feats]) for feats in cl_data_file.values()]
    return float(np.mean(per_class))


def one_hot(y, num_class: int):
    """Reference utils.py:35-36."""
    import numpy as np

    out = np.zeros((len(y), num_class), np.float32)
    out[np.arange(len(y)), np.asarray(y)] = 1.0
    return out


@contextlib.contextmanager
def profile_trace(trace_dir: Optional[str]):
    """jax.profiler trace context (no-op when trace_dir is None)."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, sink: Optional[dict] = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt
