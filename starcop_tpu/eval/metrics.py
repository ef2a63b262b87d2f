"""Confusion-matrix metric functions.

Same 2x2 confusion-matrix conventions as the reference
(/root/reference/starcop/metrics.py:8-86) and torchmetrics' binary
ConfusionMatrix: ``cm[i, j]`` counts samples with true class i predicted as
class j, i.e. cm = [[TN, FP], [FN, TP]]. All functions are jittable and work on
numpy or JAX arrays.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

Tensor = Union[np.ndarray, jax.Array]


def confusion_matrix(pred: Tensor, target: Tensor) -> jax.Array:
    """Binary 2x2 confusion matrix [[TN, FP], [FN, TP]] from 0/1 arrays.

    Jittable, static-shaped (masked sums, no boolean indexing): usable on-device
    inside the eval loop so per-tile metrics never leave the TPU.
    """
    p = jnp.asarray(pred).reshape(-1).astype(jnp.int32)
    t = jnp.asarray(target).reshape(-1).astype(jnp.int32)
    tp = jnp.sum((p == 1) & (t == 1))
    tn = jnp.sum((p == 0) & (t == 0))
    fp = jnp.sum((p == 1) & (t == 0))
    fn = jnp.sum((p == 0) & (t == 1))
    return jnp.array([[tn, fp], [fn, tp]], dtype=jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)


def masked_confusion_matrix(pred: Tensor, target: Tensor, valid: Tensor) -> jax.Array:
    """Confusion matrix restricted to ``valid`` pixels (static-shaped).

    TPU-native replacement for the reference's host-side nodata filtering loop
    (validation.py:92-103) used with orthorectified EMIT scenes.
    """
    p = jnp.asarray(pred).reshape(-1).astype(jnp.int32)
    t = jnp.asarray(target).reshape(-1).astype(jnp.int32)
    v = jnp.asarray(valid).reshape(-1).astype(bool)
    tp = jnp.sum(v & (p == 1) & (t == 1))
    tn = jnp.sum(v & (p == 0) & (t == 0))
    fp = jnp.sum(v & (p == 1) & (t == 0))
    fn = jnp.sum(v & (p == 0) & (t == 1))
    return jnp.array([[tn, fp], [fn, tp]], dtype=jnp.int32)


def _f(cm: Tensor):
    """Float32 view of a confusion matrix, backend-preserving.

    JAX inputs (incl. tracers under jit) stay JAX; everything else becomes a
    host numpy array. The per-tile eval loop calls ~12 metric functions per
    sample on 2x2 HOST matrices — routing those through jnp would dispatch a
    device program (plus a host sync at the ``float()``) per call, which over
    a remote-dispatch link (~33 ms RTT) dominates validation wall time.
    """
    if isinstance(cm, jax.Array):
        return jnp.asarray(cm, dtype=jnp.float32)
    return np.asarray(cm, dtype=np.float32)


def _xp(c):
    return jnp if isinstance(c, jax.Array) else np


def _quiet(fn):
    """Silence numpy 0/0 warnings so host metric math matches jnp's silent-nan
    semantics (empty-class tiles legitimately produce nan rates)."""
    import functools

    @functools.wraps(fn)
    def wrapped(cm):
        with np.errstate(divide="ignore", invalid="ignore"):
            return fn(cm)

    return wrapped


@_quiet
def precision(cm: Tensor):
    """TP / (TP + FP)"""
    c = _f(cm)
    return c[1, 1] / (c[1, 1] + c[0, 1])


@_quiet
def recall(cm: Tensor):
    """TP / (TP + FN)"""
    c = _f(cm)
    return c[1, 1] / (c[1, 1] + c[1, 0])


def user_accuracy(cm: Tensor):
    """TP / (TP + FP)"""
    return precision(cm)


def producer_accuracy(cm: Tensor):
    """TP / (TP + FN)"""
    return recall(cm)


def TPR(cm: Tensor):
    """TP / (TP + FN)"""
    return recall(cm)


@_quiet
def f1score(cm: Tensor):
    prec = precision(cm)
    rec = recall(cm)
    return 2 * (prec * rec) / (prec + rec)


@_quiet
def FPR(cm: Tensor):
    """FP / (FP + TN)"""
    c = _f(cm)
    return c[0, 1] / (c[0, 1] + c[0, 0])


@_quiet
def iou(cm: Tensor):
    """TP / (TP + FN + FP)"""
    c = _f(cm)
    return c[1, 1] / (c[1, 1] + c[1, 0] + c[0, 1])


@_quiet
def accuracy(cm: Tensor):
    """(TP + TN) / total"""
    c = _f(cm)
    return (c[1, 1] + c[0, 0]) / c.sum()


@_quiet
def cohen_kappa(cm: Tensor):
    c = _f(cm)
    xp = _xp(c)
    sum0 = c.sum(axis=0, keepdims=True)
    sum1 = c.sum(axis=1, keepdims=True)
    expected = sum1 @ sum0 / sum0.sum()
    w = 1.0 - xp.eye(2, dtype=xp.float32)  # off-diagonal weights
    k = (w * c).sum() / (w * expected).sum()
    return 1 - k


@_quiet
def balanced_accuracy(cm: Tensor):
    """0.5 * (recall + TNR)"""
    c = _f(cm)
    tnr = c[0, 0] / (c[0, 0] + c[0, 1])
    return 0.5 * (recall(cm) + tnr)


def TP(cm: Tensor):
    return cm[1, 1] if hasattr(cm, "__getitem__") and hasattr(cm, "shape") else np.asarray(cm)[1, 1]


def TN(cm: Tensor):
    return cm[0, 0] if hasattr(cm, "__getitem__") and hasattr(cm, "shape") else np.asarray(cm)[0, 0]


def FP(cm: Tensor):
    return cm[0, 1] if hasattr(cm, "__getitem__") and hasattr(cm, "shape") else np.asarray(cm)[0, 1]


def FN(cm: Tensor):
    return cm[1, 0] if hasattr(cm, "__getitem__") and hasattr(cm, "shape") else np.asarray(cm)[1, 0]


METRICS_CONFUSION_MATRIX = [precision, recall, f1score, iou, accuracy, cohen_kappa, balanced_accuracy]
