"""Spatial (3D) stack tests: neighbors, SchNet, GVP equivariance, PaiNN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from notorch_tpu.data.point_cloud import BatchedPointCloud, PointCloud, pad_point_clouds
from notorch_tpu.nn.spatial import agg as sagg
from notorch_tpu.nn.spatial.gvp import GVP, GatedGVP, GvpGNNBlock
from notorch_tpu.nn.spatial.neighbors import radius_neighbors
from notorch_tpu.nn.spatial.painn import GatedEquivariantBlock
from notorch_tpu.nn.spatial.pointwise import PointwiseEmbed
from notorch_tpu.nn.spatial.schnet import SchnetBlock


def _clouds(rng, sizes=(5, 8)):
    clouds = []
    for n in sizes:
        clouds.append(
            PointCloud(
                node_types=rng.integers(0, 10, size=(n, 1)).astype(np.int32),
                coords=rng.normal(size=(n, 3)).astype(np.float32) * 2.0,
            )
        )
    return pad_point_clouds(clouds, node_cap=16, graph_cap=3)


def test_radius_neighbors_basic():
    coords = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [10, 10, 10]], dtype=jnp.float32
    )
    batch = jnp.asarray([0, 0, 0, 1])
    nbrs, mask, dists = radius_neighbors(coords, batch, radius=2.0, max_neighbors=3)
    # point 0 sees points 1 and 2 (distance 1), never the other-graph point
    assert mask[0].sum() == 2
    assert set(np.asarray(nbrs[0][np.asarray(mask[0])]).tolist()) == {1, 2}
    np.testing.assert_allclose(np.asarray(dists[0][np.asarray(mask[0])]), 1.0, rtol=1e-5)
    # isolated point has no neighbors
    assert mask[3].sum() == 0


def test_radius_neighbors_nearest_k():
    coords = jnp.asarray([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]], dtype=jnp.float32)
    batch = jnp.zeros(4, dtype=jnp.int32)
    nbrs, mask, dists = radius_neighbors(coords, batch, radius=10.0, max_neighbors=2)
    # nearest 2 for point 0 are 1 and 2
    assert set(np.asarray(nbrs[0]).tolist()) == {1, 2}


def test_schnet_forward(rng):
    P = _clouds(rng)
    embed = PointwiseEmbed(num_types=50, hidden_dim=32)
    block = SchnetBlock(hidden_dim=32, depth=2, radius=5.0, max_neighbors=8)
    key = jax.random.PRNGKey(0)
    ev = embed.init(key, P)
    P1 = embed.apply(ev, P)
    bv = block.init(key, P1)
    out = block.apply(bv, P1)
    assert out.node_feats.shape == (16, 32)
    assert np.isfinite(np.asarray(out.node_feats)).all()

    # padding isolation: adding a second cloud must not change the first's feats
    P_single = pad_point_clouds(
        [PointCloud(np.asarray(P.node_feats)[:5], np.asarray(P.coords)[:5])],
        node_cap=16,
        graph_cap=3,
    )
    out_single = block.apply(bv, embed.apply(ev, P_single))
    np.testing.assert_allclose(
        np.asarray(out_single.node_feats)[:5], np.asarray(out.node_feats)[:5], rtol=2e-4, atol=1e-5
    )


def _random_rotation(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q.astype(np.float32)


def test_gvp_equivariance(rng):
    """Rotating input vectors rotates output vectors and fixes scalars."""
    s = jnp.asarray(rng.normal(size=(7, 12)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(7, 3, 6)).astype(np.float32))
    R = _random_rotation(rng)

    for mod in [GVP(out_scalar=10, out_vector=4), GatedGVP(out_scalar=10, out_vector=4)]:
        params = mod.init(jax.random.PRNGKey(0), (s, v))
        s1, v1 = mod.apply(params, (s, v))
        s2, v2 = mod.apply(params, (s, jnp.einsum("ij,njc->nic", R, v)))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(jnp.einsum("ij,njc->nic", R, v1)), np.asarray(v2), rtol=1e-4, atol=1e-5
        )


def test_gvp_gnn_rotation_invariance(rng):
    """Rotating the whole point cloud leaves scalar outputs unchanged."""
    P = _clouds(rng)
    embed = PointwiseEmbed(num_types=50, hidden_dim=16)
    block = GvpGNNBlock(scalar_dim=16, vector_dim=4, depth=2, radius=5.0, max_neighbors=8)
    key = jax.random.PRNGKey(0)
    ev = embed.init(key, P)
    P1 = embed.apply(ev, P)
    bv = block.init(key, P1)
    out1 = block.apply(bv, P1)

    R = _random_rotation(rng)
    P_rot = P1.update(coords=P1.coords @ jnp.asarray(R).T)
    out2 = block.apply(bv, P_rot)
    mask = np.asarray(P.node_mask)
    np.testing.assert_allclose(
        np.asarray(out1.node_feats)[mask], np.asarray(out2.node_feats)[mask], rtol=5e-3, atol=1e-4
    )


def test_painn_geb_equivariance(rng):
    s = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(5, 3, 6)).astype(np.float32))
    mod = GatedEquivariantBlock(scalar_dim=8, vector_dim=6)
    params = mod.init(jax.random.PRNGKey(0), (s, v))
    R = _random_rotation(rng)
    s1, v1 = mod.apply(params, (s, v))
    s2, v2 = mod.apply(params, (s, jnp.einsum("ij,njc->nic", R, v)))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("ij,njc->nic", R, v1)), np.asarray(v2), rtol=1e-4, atol=1e-5
    )


def test_spatial_aggregations(rng):
    P = _clouds(rng)
    feats = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    P = P.update(node_feats=feats)
    key = jax.random.PRNGKey(0)
    out = sagg.Sum().apply(sagg.Sum().init(key, P), P)
    assert out.shape == (3, 8)
    bi = np.asarray(P.batch_index)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(feats)[bi == 0].sum(0), rtol=1e-5)
    g = sagg.Gated(input_dim=8)
    gv = g.init(key, P)
    out_g = g.apply(gv, P)
    assert np.isfinite(np.asarray(out_g)).all()


def test_sdf_to_pointcloud_to_schnet(tmp_path, rng):
    """Full spatial data path: SDF coords -> PointCloud -> dataset batch ->
    SchNet forward."""
    from notorch_tpu.data.batching import DataLoader
    from notorch_tpu.data.databases import SDFDatabase
    from notorch_tpu.data.dataset import (
        DatabaseManager,
        MolecularDataset,
        TargetSpec,
        TransformManager,
    )
    from notorch_tpu.transforms.point_cloud import MolToPointCloud

    from .test_databases import MOLBLOCK

    (tmp_path / "mols.sdf").write_text(MOLBLOCK)
    db = SDFDatabase(tmp_path / "mols.sdf")
    assert getattr(db[0], "coords", None) is not None
    assert db[0].coords.shape == (3, 3)

    ds = MolecularDataset(
        {"idx": [0, 1], "y": [1.0, 2.0]},
        transforms={"p": TransformManager(MolToPointCloud(), in_key="mol")},
        databases={"mols": DatabaseManager(db, in_key="idx", out_key="mol")},
        targets={"y": TargetSpec(columns=["y"])},
    )
    # dataset collate: PointCloud values pad through the transform collate
    samples = [ds[0], ds[1]]
    clouds = [s["P"] for s in samples]
    P = MolToPointCloud.collate(clouds)
    assert P.num_nodes == 64 and int(P.node_mask.sum()) == 5

    block = SchnetBlock(hidden_dim=16, depth=1, radius=3.0, max_neighbors=4)
    embed = PointwiseEmbed(num_types=42, hidden_dim=16)
    key = jax.random.PRNGKey(0)
    P1 = embed.apply(embed.init(key, P), P)
    out = block.apply(block.init(key, P1), P1)
    assert np.isfinite(np.asarray(out.node_feats)).all()


def test_spatial_model_learns_geometry(rng):
    """SchNet/GVP property predictors learn a geometric target (mean
    coordination number) end to end through the declarative Model."""
    import jax.numpy as _jnp
    import numpy as _np

    from notorch_tpu.models.spatial import build_spatial_model

    clouds, ys = [], []
    for _ in range(24):
        n = int(rng.integers(4, 10))
        coords = rng.normal(size=(n, 3)).astype(np.float32) * 1.5
        d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
        coord_num = ((d < 2.0).sum(1) - 1).mean()  # mean neighbors within 2A
        clouds.append(
            PointCloud(
                node_types=rng.integers(0, 10, size=(n, 1)).astype(np.int32),
                coords=coords,
            )
        )
        ys.append(coord_num)
    ys = np.asarray(ys, dtype=np.float32)[:, None]

    P = pad_point_clouds(clouds, node_cap=256, graph_cap=24)
    batch = {
        "inputs.P": P,
        "targets.y": _jnp.asarray(ys),
        "targets.y_mask": _jnp.ones_like(ys, dtype=bool),
    }

    for backbone in ["schnet", "gvp"]:
        model = build_spatial_model(
            backbone=backbone, hidden_dim=32, depth=2, radius=2.0, max_neighbors=8
        )
        state = model.init(jax.random.PRNGKey(0), batch)
        losses = []
        for _ in range(80):
            state, logs = model.train_step(state, batch)
            losses.append(float(logs["train/loss"]))
        assert losses[-1] < losses[0] * 0.35, (backbone, losses[0], losses[-1])


def test_banded_neighbors_match_full():
    """The banded neighbor search (window=W) equals the full N^2 search
    whenever every cloud fits in the band — same indices (up to ties), same
    masks, same distances."""
    rng = np.random.default_rng(7)
    from notorch_tpu.data.point_cloud import PointCloud, pad_point_clouds
    from notorch_tpu.nn.spatial.neighbors import radius_neighbors

    clouds = []
    max_n = 0
    for _ in range(9):
        n = int(rng.integers(3, 14))
        max_n = max(max_n, n)
        coords = rng.uniform(0, (n * 8.0) ** (1 / 3), size=(n, 3)).astype(np.float32)
        clouds.append(PointCloud(rng.integers(0, 5, (n, 1)).astype(np.int32), coords))
    P = pad_point_clouds(clouds, node_cap=128, graph_cap=9)

    real = np.asarray(P.node_mask)  # padding rows all sit at 1e9 and
    # "neighbor" each other at d=0 (both paths) — tied, masked downstream
    for K in (4, 8):
        full = radius_neighbors(P.coords, P.batch_index, 5.0, K)
        band = radius_neighbors(
            P.coords, P.batch_index, 5.0, K, window=max_n - 1
        )
        np.testing.assert_array_equal(
            np.asarray(band[1])[real], np.asarray(full[1])[real]
        )
        np.testing.assert_allclose(
            np.asarray(band[2])[real], np.asarray(full[2])[real],
            rtol=1e-6, atol=1e-7,
        )
        # indices agree as sets on real rows (ties permute within radius)
        fm, bm = np.asarray(full[1]), np.asarray(band[1])
        fi, bi = np.asarray(full[0]), np.asarray(band[0])
        for row in np.nonzero(real)[0]:
            assert set(fi[row][fm[row]]) == set(bi[row][bm[row]])


def test_banded_schnet_matches_full():
    """SchnetBlock(neighbor_window=W) output equals the full-search block
    on the same params."""
    from notorch_tpu.nn.spatial.pointwise import PointwiseEmbed
    from notorch_tpu.nn.spatial.schnet import SchnetBlock

    rng = np.random.default_rng(3)
    P = _clouds(rng)
    embed = PointwiseEmbed(num_types=50, hidden_dim=32)
    key = jax.random.PRNGKey(0)
    ev = embed.init(key, P)
    P1 = embed.apply(ev, P)
    full = SchnetBlock(hidden_dim=32, depth=2, radius=5.0, max_neighbors=8)
    band = SchnetBlock(
        hidden_dim=32, depth=2, radius=5.0, max_neighbors=8, neighbor_window=8
    )
    bv = full.init(key, P1)
    out_full = np.asarray(full.apply(bv, P1).node_feats)
    out_band = np.asarray(band.apply(bv, P1).node_feats)
    np.testing.assert_allclose(out_band, out_full, rtol=1e-5, atol=1e-6)


def test_banded_gvp_matches_full():
    """GvpGNNBlock(neighbor_window=W) equals the full-search block on the
    same params."""
    from notorch_tpu.nn.spatial.gvp import GvpGNNBlock

    rng = np.random.default_rng(5)
    P = _clouds(rng)
    P = P.update(node_feats=jnp.asarray(
        rng.normal(size=(P.num_nodes, 8)).astype(np.float32)))
    full = GvpGNNBlock(scalar_dim=16, vector_dim=4, depth=2, radius=5.0, max_neighbors=8)
    band = GvpGNNBlock(
        scalar_dim=16, vector_dim=4, depth=2, radius=5.0, max_neighbors=8,
        neighbor_window=8,
    )
    bv = full.init(jax.random.PRNGKey(0), P)
    out_full = np.asarray(full.apply(bv, P).node_feats)
    out_band = np.asarray(band.apply(bv, P).node_feats)
    np.testing.assert_allclose(out_band, out_full, rtol=1e-5, atol=1e-6)


def test_nbr_take_backward_exact():
    """The MXU one-hot gather backward (gvp._nbr_take) is the exact VJP of
    x[nbrs] — matches plain autodiff for an arbitrary cotangent, including
    repeated and padding indices."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from notorch_tpu.nn.spatial.gvp import _nbr_take

    rng = np.random.default_rng(0)
    N, K, d = 100, 7, 5
    x = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    nbrs = jnp.asarray(rng.integers(0, N, size=(N, K)).astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(N, K, d)).astype(np.float32))

    g1 = jax.grad(lambda x: (x[nbrs] * cot).sum())(x)
    g2 = jax.grad(lambda x: (_nbr_take(x, nbrs) * cot).sum())(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5, atol=1e-6)

    # vector-rank payload ([N, 3, dv]) as GvpConv uses
    v = jnp.asarray(rng.normal(size=(N, 3, 4)).astype(np.float32))
    cotv = jnp.asarray(rng.normal(size=(N, K, 3, 4)).astype(np.float32))
    g1 = jax.grad(lambda v: (v[nbrs] * cotv).sum())(v)
    g2 = jax.grad(lambda v: (_nbr_take(v, nbrs) * cotv).sum())(v)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5, atol=1e-6)


def test_fused_gvp_conv_matches_jnp():
    """GvpConv(impl='fused') — the Pallas message-stack kernel — matches the
    jnp oracle (same params) in outputs AND gradients, interpret mode."""
    import numpy as np

    from notorch_tpu.data.point_cloud import PointCloud, pad_point_clouds
    from notorch_tpu.nn.spatial.gvp import GvpGNNBlock

    rng = np.random.default_rng(0)
    clouds = []
    for _ in range(12):
        n = int(rng.integers(8, 20))
        coords = rng.uniform(0, 6.0, size=(n, 3)).astype(np.float32)
        types = rng.integers(0, 9, size=(n, 1)).astype(np.int32)
        clouds.append(PointCloud(types, coords))
    P = pad_point_clouds(clouds, 192)  # 192 % 64 == 0
    P = P.update(
        node_feats=jnp.asarray(rng.normal(size=(192, 32)).astype(np.float32))
    )

    mk = lambda impl: GvpGNNBlock(
        scalar_dim=32, vector_dim=8, depth=2, radius=5.0, max_neighbors=8,
        neighbor_window=24, impl=impl,
    )
    ref = mk("jnp")
    params = ref.init(jax.random.PRNGKey(0), P)
    fused = mk("fused")
    # identical param trees (checkpoint compatibility)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(0), P)
    )

    o_ref = ref.apply(params, P).node_feats
    o_fus = fused.apply(params, P).node_feats  # SAME params
    np.testing.assert_allclose(
        np.asarray(o_fus), np.asarray(o_ref), rtol=2e-4, atol=1e-5
    )

    def loss(block):
        def f(p):
            o = block.apply(p, P).node_feats
            return jnp.sum(jnp.sin(o))
        return f

    l_ref, g_ref = jax.value_and_grad(loss(ref))(params)
    l_fus, g_fus = jax.value_and_grad(loss(fused))(params)
    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_fus), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=2e-5
        )
