"""Debug: which gradient leaf diverges between fused and jnp attention on
chip, and does the raw kernel (not the module) show the same divergence?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import csv
import json

import jax
import jax.numpy as jnp
import numpy as np

from notorch_tpu.data.dense import pack_graphs_dense, plan_bins
from notorch_tpu.nn.attention_dense import DenseGATBlock, DenseGraphSelfAttention
from notorch_tpu.nn.chemprop_dense import DenseGraphEmbedding
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "data", "lipo.csv")
with open(path) as f:
    smis = [row["smiles"] for row in csv.DictReader(f)][:64]
pipe = Pipeline(SmiToMol(), MolToGraph())
graphs = [pipe(s) for s in smis]
V_b, E_b = 128, 256
n_bins = -(-len(plan_bins(graphs, V_b, E_b)) // 8) * 8
pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)
hidden, heads = 256, 4

key = jax.random.PRNGKey(0)
dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
dev = dembed.init(key, pk)
Gp = dembed.apply(dev, pk)

# ---- module level, single attention layer ---------------------------------
ref = DenseGraphSelfAttention(hidden_dim=hidden, num_heads=heads)
fus = DenseGraphSelfAttention(hidden_dim=hidden, num_heads=heads,
                              impl="fused", bins_per_tile=4)
params = ref.init(key, Gp)


def loss(block):
    def f(p):
        o = block.apply(p, Gp).node_feats
        return jnp.sum(o * o)
    return f


g_ref = jax.grad(loss(ref))(params)
g_fus = jax.grad(loss(fus))(params)
flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
flat_f = jax.tree_util.tree_flatten_with_path(g_fus)[0]
for (pr, a), (pf, b) in zip(flat_r, flat_f):
    name = "/".join(str(k) for k in pr)
    rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12))
    print(json.dumps({"leaf": name, "rel": rel,
                      "ref_max": float(jnp.max(jnp.abs(a))),
                      "fus_max": float(jnp.max(jnp.abs(b)))}), flush=True)

# ---- kernel level ----------------------------------------------------------
from notorch_tpu.kernels.dense_attention import fused_dense_attention

kk = jax.random.split(key, 4)
B, V, d = Gp.node_feats.shape
E = Gp.src.shape[1]
q = jax.random.normal(kk[0], (B, V, d), jnp.float32)
k = jax.random.normal(kk[1], (B, V, d), jnp.float32)
v = jax.random.normal(kk[2], (B, V, d), jnp.float32)
eb = jax.random.normal(kk[3], (B, heads, E), jnp.float32)


def jnp_core(q, k, v, eb):
    dh = d // heads
    qh = q.reshape(B, V, heads, dh)
    kh = k.reshape(B, V, heads, dh)
    vh = v.reshape(B, V, heads, dh)
    S = Gp.scatter_matrix(jnp.float32)
    Gm = Gp.gather_matrix(jnp.float32)
    M = jnp.einsum("bie,bej->bij", S, Gm)
    scores = jnp.einsum("bihd,bjhd->bhij", qh, kh) / jnp.sqrt(float(dh))
    ebh = jnp.swapaxes(eb, 1, 2)  # [B, E, H]
    SB = S[:, :, :, None] * ebh[:, None, :, :]
    scores = scores + jnp.einsum("bieh,bej->bhij", SB, Gm)
    mask = (M > 0)[:, None, :, :]
    neg = jnp.where(mask, scores, -jnp.inf)
    mx = jnp.max(neg, axis=-1, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    ex = jnp.where(mask, jnp.exp(neg - mx), 0.0)
    alpha = ex / jnp.maximum(ex.sum(axis=-1, keepdims=True), 1e-12)
    return jnp.einsum("bhij,bjhd->bihd", alpha, vh).reshape(B, V, d)


def fused_core(q, k, v, eb):
    return fused_dense_attention(q, k, v, eb, Gp.src, Gp.dst, Gp.edge_mask, heads, 4)


cot = jax.random.normal(jax.random.PRNGKey(9), (B, V, d), jnp.float32)


def lref(*a):
    return jnp.sum(jnp_core(*a) * cot)


def lfus(*a):
    return jnp.sum(fused_core(*a) * cot)


o_r = jnp_core(q, k, v, eb)
o_f = fused_core(q, k, v, eb)
print(json.dumps({"kernel_fwd_rel": float(jnp.max(jnp.abs(o_f - o_r)) /
                                          (jnp.max(jnp.abs(o_r)) + 1e-12))}), flush=True)

gr = jax.grad(lref, argnums=(0, 1, 2, 3))(q, k, v, eb)
gf = jax.grad(lfus, argnums=(0, 1, 2, 3))(q, k, v, eb)
for name, a, b in zip(("q", "k", "v", "eb"), gr, gf):
    rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12))
    print(json.dumps({"kernel_grad_leaf": name, "rel": rel,
                      "ref_max": float(jnp.max(jnp.abs(a))),
                      "fus_max": float(jnp.max(jnp.abs(b)))}), flush=True)
