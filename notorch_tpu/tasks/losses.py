"""Loss functions as pure, maskable JAX callables.

Capability parity: reference ``notorch/nn/loss/loss.py`` (MSE/Bounded*/MVE/
Evidential/BCE/CrossEntropy/Dirichlet/SelfSupervised) and ``loss/rnc.py``
(Rank-N-Contrast). Every loss takes ``(preds, targets, *, mask,
sample_weights)`` and returns a scalar via the shared masked reduce
(reference ``loss.py:51-60``): masked elements contribute nothing and the
normalizer is the mask sum — which also makes batch padding free.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

__all__ = [
    "masked_reduce",
    "SelfSupervisedLoss",
    "MSE",
    "BoundedMSE",
    "MAE",
    "BoundedMAE",
    "MVE",
    "MeanVarianceEstimation",
    "Evidential",
    "BinaryCrossEntropy",
    "BCE",
    "CrossEntropy",
    "XENT",
    "Dirichlet",
    "BinaryMCCLoss",
    "MulticlassMCCLoss",
    "SID",
    "Wasserstein",
    "RankNContrastLoss",
]


def masked_reduce(loss, mask=None, sample_weights=None):
    """Masked, sample-weighted MEAN of an elementwise loss.

    Semantics (pinned by ``tests/test_task_types.py::
    test_masked_reduce_weighted_mean``): the result is a true weighted mean,
    ``sum(w * m * loss) / sum(w * m)`` — the normalizer includes the sample
    weights, with and without a mask, so weights re-weight samples rather
    than re-scale the loss. The reference's ``_reduce`` (loss.py:51-60)
    multiplies by the weights but normalizes by the element count (weights
    change the scale, not the weighting) and carries an ``unsqueeze(0)``
    broadcasting bug besides — deliberately not matched.

    ``sample_weights`` is per-sample ``[B]``, broadcast over trailing task
    dims; masked elements contribute nothing, which keeps batch padding free.
    """
    if mask is None and sample_weights is None:
        return loss.mean()
    w = (
        jnp.ones_like(loss)
        if mask is None
        else jnp.broadcast_to(mask.astype(loss.dtype), loss.shape)
    )
    if sample_weights is not None:
        sw = jnp.reshape(sample_weights, sample_weights.shape + (1,) * (loss.ndim - 1))
        w = w * sw.astype(loss.dtype)
    return (loss * w).sum() / jnp.maximum(w.sum(), 1e-9)


@dataclass(frozen=True)
class SelfSupervisedLoss:
    """Pass-through for scalar self-supervised/auxiliary loss terms
    (reference loss.py:24-36)."""

    def __call__(self, inputs, **kwargs):
        return jnp.asarray(inputs).reshape(())


def _apply_bounds(preds, targets, lt_mask, gt_mask):
    """Censored-regression clamping (reference ``_BoundedMixin``, loss.py:63-77):
    inside the bound the error is zeroed."""
    preds = jnp.where((preds < targets) & lt_mask, targets, preds)
    preds = jnp.where((preds > targets) & gt_mask, targets, preds)
    return preds


@dataclass(frozen=True)
class MSE:
    def __call__(self, preds, targets, *, mask=None, sample_weights=None, **kw):
        return masked_reduce((preds - targets) ** 2, mask, sample_weights)


@dataclass(frozen=True)
class MAE:
    def __call__(self, preds, targets, *, mask=None, sample_weights=None, **kw):
        return masked_reduce(jnp.abs(preds - targets), mask, sample_weights)


@dataclass(frozen=True)
class BoundedMSE:
    def __call__(self, preds, targets, *, lt_mask, gt_mask, mask=None, sample_weights=None, **kw):
        preds = _apply_bounds(preds, targets, lt_mask, gt_mask)
        return masked_reduce((preds - targets) ** 2, mask, sample_weights)


@dataclass(frozen=True)
class BoundedMAE:
    def __call__(self, preds, targets, *, lt_mask, gt_mask, mask=None, sample_weights=None, **kw):
        preds = _apply_bounds(preds, targets, lt_mask, gt_mask)
        return masked_reduce(jnp.abs(preds - targets), mask, sample_weights)


@dataclass(frozen=True)
class MeanVarianceEstimation:
    """Gaussian NLL of Nix & Weigend (1994), Eq. 9 (reference loss.py:98-123).
    ``preds``: [b, t, 2] (mean, var)."""

    eps: float = 1e-8

    def __call__(self, preds, targets, *, mask=None, sample_weights=None, **kw):
        mean, var = preds[..., 0], preds[..., 1]
        var = jnp.maximum(var, self.eps)
        nll = (mean - targets) ** 2 / (2 * var)
        kl = jnp.log(2 * jnp.pi * var) / 2
        return masked_reduce(nll + kl, mask, sample_weights)


@dataclass(frozen=True)
class Evidential:
    """Deep evidential regression (Soleimany et al. 2021; reference
    loss.py:126-168). ``preds``: [b, t, 4] raw (mean, v, alpha, beta) heads.

    Unlike the reference (which feeds raw heads into logs — NaN-prone), the
    positivity transforms are applied here, matching the parameterization
    the preds-side ``Evidential`` transform uses at inference."""

    v_kl: float = 0.2
    eps: float = 1e-8

    def __call__(self, preds, targets, *, mask=None, sample_weights=None, **kw):
        mean, v, alpha, beta = (preds[..., i] for i in range(4))
        v = jax.nn.softplus(v) + self.eps
        alpha = jax.nn.softplus(alpha) + 1
        beta = jax.nn.softplus(beta) + self.eps
        residuals = targets - mean
        two_b_lambda = 2 * beta * (1 + v)
        nll = (
            0.5 * jnp.log(jnp.pi / v)
            - alpha * jnp.log(two_b_lambda)
            + (alpha + 0.5) * jnp.log(v * residuals**2 + two_b_lambda)
            + jax.lax.lgamma(alpha)
            - jax.lax.lgamma(alpha + 0.5)
        )
        reg = (2 * v + alpha) * jnp.abs(residuals)
        return masked_reduce(nll + self.v_kl * (reg - self.eps), mask, sample_weights)


@dataclass(frozen=True)
class BinaryCrossEntropy:
    """BCE with logits (reference loss.py:171-182)."""

    def __call__(self, preds, targets, *, mask=None, sample_weights=None, **kw):
        # numerically stable log-sigmoid formulation
        L = jnp.maximum(preds, 0) - preds * targets + jnp.log1p(jnp.exp(-jnp.abs(preds)))
        return masked_reduce(L, mask, sample_weights)


@dataclass(frozen=True)
class CrossEntropy:
    """Softmax cross-entropy over the trailing class axis of ``preds`` [b,t,k]
    against integer ``targets`` [b,t] (reference loss.py:185-198)."""

    def __call__(self, preds, targets, *, mask=None, sample_weights=None, **kw):
        logp = jax.nn.log_softmax(preds, axis=-1)
        tgt = targets.astype(jnp.int32)
        L = -jnp.take_along_axis(logp, tgt[..., None], axis=-1).squeeze(-1)
        return masked_reduce(L, mask, sample_weights)


@dataclass(frozen=True)
class Dirichlet:
    """Evidential Dirichlet classification loss (Sensoy et al. 2018;
    reference loss.py:268-317). ``preds``: [b, t, k] pre-evidence logits."""

    v_kl: float = 0.2
    num_classes: int = 2

    def __call__(self, preds, targets, *, mask=None, sample_weights=None, **kw):
        alphas = jax.nn.softplus(preds) + 1
        k = alphas.shape[-1]
        onehot = jax.nn.one_hot(targets.astype(jnp.int32), k, dtype=alphas.dtype)

        S = alphas.sum(-1, keepdims=True)
        probs = alphas / S
        A = ((onehot - probs) ** 2).sum(-1)
        B = (probs * (1 - probs) / (S + 1)).sum(-1)
        L_mse = A + B

        alpha_tilde = onehot + (1 - onehot) * alphas
        beta = jnp.ones_like(alpha_tilde)
        S_alpha = alpha_tilde.sum(-1)
        S_beta = beta.sum(-1)
        ln_alpha = jax.lax.lgamma(S_alpha) - jax.lax.lgamma(alpha_tilde).sum(-1)
        ln_beta = jax.lax.lgamma(beta).sum(-1) - jax.lax.lgamma(S_beta)
        dg0 = jax.lax.digamma(alpha_tilde)
        dg1 = jax.lax.digamma(S_alpha)[..., None]
        L_kl = ln_alpha + ln_beta + ((alpha_tilde - beta) * (dg0 - dg1)).sum(-1)

        return masked_reduce(L_mse + self.v_kl * L_kl, mask, sample_weights)


@dataclass(frozen=True)
class BinaryMCCLoss:
    """Soft Matthews-correlation loss for (multitask) binary classification:
    ``1 - MCC`` from soft confusion counts, per task, weighted-mean over tasks.

    Capability parity with the reference's commented-out ``BinaryMCCLoss``
    (loss.py:230-239). The reference branches on the observed value range to
    decide logits-vs-probs at runtime; that is data-dependent control flow, so
    here the choice is the static ``from_logits`` flag.
    """

    from_logits: bool = True
    eps: float = 1e-8

    def __call__(
        self, preds, targets, *, mask=None, sample_weights=None, task_weights=None, **kw
    ):
        p = jax.nn.sigmoid(preds) if self.from_logits else preds
        y = targets.astype(p.dtype)
        w = jnp.ones_like(p)
        if mask is not None:
            w = w * mask.astype(p.dtype)
        if sample_weights is not None:
            w = w * sample_weights[:, None]
        TP = (y * p * w).sum(0)
        FP = ((1 - y) * p * w).sum(0)
        TN = ((1 - y) * (1 - p) * w).sum(0)
        FN = (y * (1 - p) * w).sum(0)
        denom = jnp.sqrt((TP + FP) * (TP + FN) * (TN + FP) * (TN + FN))
        mcc = (TP * TN - FP * FN) / jnp.maximum(denom, self.eps)
        L = 1 - mcc
        if task_weights is not None:
            L = L * task_weights
        return L.mean()


@dataclass(frozen=True)
class MulticlassMCCLoss:
    """Multiclass MCC loss (sklearn's covariance form), ``1 - MCC``.

    Capability parity with the reference's commented-out ``MulticlassMCCLoss``
    (loss.py:242-264). ``preds``: [b, t, k] probabilities (or logits with
    ``from_logits``); ``targets``: [b, t] int class ids. Like the reference,
    the hard-argmax confusion counts make this a training signal mostly
    through the ``s`` term — it is primarily a differentiable-ish metric.
    """

    from_logits: bool = True
    eps: float = 1e-12

    def __call__(
        self, preds, targets, *, mask=None, sample_weights=None, task_weights=None, **kw
    ):
        p = jax.nn.softmax(preds, axis=-1) if self.from_logits else preds
        k = p.shape[-1]
        bin_t = jax.nn.one_hot(targets.astype(jnp.int32), k, dtype=p.dtype)
        bin_p = jax.nn.one_hot(jnp.argmax(p, axis=-1), k, dtype=p.dtype)
        w = jnp.ones(p.shape[:2], p.dtype)
        if mask is not None:
            w = w * mask.astype(p.dtype)
        if sample_weights is not None:
            w = w * sample_weights[:, None]
        w = w[..., None]
        pc = (bin_p * w).sum(0)  # [t, k]
        tc = (bin_t * w).sum(0)
        c = (bin_p * bin_t * w).sum()
        s = (p * w).sum()
        cov_ytyp = c * s - (pc * tc).sum()
        cov_ypyp = s * s - (pc * pc).sum()
        cov_ytyt = s * s - (tc * tc).sum()
        x = cov_ypyp * cov_ytyt
        mcc = jnp.where(x <= self.eps, 0.0, cov_ytyp / jnp.sqrt(jnp.maximum(x, self.eps)))
        L = 1 - mcc
        if task_weights is not None:
            L = L * jnp.asarray(task_weights).mean()
        return L


@dataclass(frozen=True)
class SID:
    """Spectral information divergence for spectra-valued targets: symmetric
    KL between the (mask-)normalized predicted spectrum and the target.

    Capability parity with the reference's commented-out ``SIDLoss``
    (loss.py:325-337). ``preds``/``targets``: [b, s] nonnegative spectra;
    ``mask`` marks valid spectrum bins; masked bins are filled with 1 so they
    contribute ``log(1) * 1 = 0``.
    """

    threshold: float | None = None

    def __call__(self, preds, targets, *, mask=None, sample_weights=None, **kw):
        if self.threshold is not None:
            preds = jnp.clip(preds, min=self.threshold)
        m = jnp.ones_like(preds, bool) if mask is None else mask.astype(bool)
        mf = m.astype(preds.dtype)
        preds_norm = preds / (preds * mf).sum(1, keepdims=True)
        t = jnp.where(m, targets, 1.0)
        pn = jnp.where(m, preds_norm, 1.0)
        L = jnp.log(pn / t) * pn + jnp.log(t / pn) * t
        return masked_reduce(L, mask, sample_weights)


@dataclass(frozen=True)
class Wasserstein:
    """Earth-mover distance between cumulative spectra (reference's
    commented-out ``WassersteinLoss``, loss.py:340-347)."""

    threshold: float | None = None

    def __call__(self, preds, targets, *, mask=None, sample_weights=None, **kw):
        if self.threshold is not None:
            preds = jnp.clip(preds, min=self.threshold)
        mf = (
            jnp.ones_like(preds)
            if mask is None
            else mask.astype(preds.dtype)
        )
        preds_norm = preds / (preds * mf).sum(1, keepdims=True)
        L = jnp.abs(jnp.cumsum(targets, axis=1) - jnp.cumsum(preds_norm, axis=1))
        return masked_reduce(L, mask, sample_weights)


# reference-compatible aliases (loss.py:349-351)
MVE = MeanVarianceEstimation
BCE = BinaryCrossEntropy
XENT = CrossEntropy


def _cdist(A, B, p: float):
    diff = jnp.abs(A[..., :, None, :] - B[..., None, :, :])
    if p == 1.0:
        return diff.sum(-1)
    if p == 2.0:
        return jnp.sqrt(jnp.maximum((diff**2).sum(-1), 1e-12))
    return (diff**p).sum(-1) ** (1.0 / p)


@dataclass(frozen=True)
class PNorm:
    p: float = 2.0
    negate: bool = False

    def __call__(self, A, B=None):
        X = _cdist(A, A if B is None else B, self.p)
        return -X if self.negate else X


@dataclass(frozen=True)
class RankNContrastLoss:
    """Rank-N-Contrast regression-contrastive loss (reference rnc.py:39-75):
    for each anchor i and positive j, the normalizer runs over the samples k
    whose label-distance to i is at least that of j."""

    distance: PNorm = field(default_factory=lambda: PNorm(p=1.0))
    similarity: PNorm = field(default_factory=lambda: PNorm(p=2.0, negate=True))
    temp: float = 2.0
    eps: float = 1e-6

    def __call__(self, inputs, targets, *, mask=None, sample_weights=None, **kw):
        N = targets.shape[0]
        dists = self.distance(targets)  # [N, N]
        sims = self.similarity(inputs) / self.temp  # [N, N]
        scores = jnp.exp(sims)

        off_diag = ~jnp.eye(N, dtype=bool)
        # include_mask[i, j, k] = 1 where d(i,k) >= d(i,j), k != i
        include = (dists[:, None, :] >= dists[:, :, None]) & off_diag[:, None, :]
        denom = (scores[:, None, :] * include).sum(-1) + self.eps  # [N, N]
        nll = -(sims - jnp.log(denom))
        return (nll * off_diag).sum() / jnp.maximum(off_diag.sum(), 1)
