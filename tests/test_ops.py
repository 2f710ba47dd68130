import jax
import jax.numpy as jnp
import numpy as np

from onepose_st_tpu.ops import attention, matching, windows


# ---------------- attention ----------------


def np_linear_attention(q, k, v, q_mask=None, kv_mask=None, eps=1e-6):
    """Direct O(N^2) reference implementation of elu+1 linear attention."""
    def fm(x):
        return np.where(x > 0, x + 1.0, np.exp(x))

    Q, K = fm(q), fm(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None]
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None]
        v = v * kv_mask[:, :, None, None]
    # out_l = sum_s (Q_l . K_s) V_s / sum_s (Q_l . K_s)
    qk = np.einsum("blhd,bshd->blhs", Q, K)
    num = np.einsum("blhs,bshd->blhd", qk, v)
    den = qk.sum(-1)[..., None] + eps
    return num / den


def test_linear_attention_matches_quadratic(rng):
    B, L, S, H, D = 2, 17, 23, 4, 8
    q = rng.normal(size=(B, L, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, H, D)).astype(np.float32)
    v = rng.normal(size=(B, S, H, D)).astype(np.float32)
    got = np.asarray(attention.linear_attention(*map(jnp.asarray, (q, k, v))))
    want = np_linear_attention(q, k, v)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_linear_attention_masks(rng):
    B, L, S, H, D = 1, 8, 12, 2, 4
    q = rng.normal(size=(B, L, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, H, D)).astype(np.float32)
    v = rng.normal(size=(B, S, H, D)).astype(np.float32)
    kv_mask = np.ones((B, S), dtype=bool)
    kv_mask[:, 8:] = False
    # masked == truncated
    got = np.asarray(
        attention.linear_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_mask=jnp.asarray(kv_mask)
        )
    )
    want = np.asarray(
        attention.linear_attention(
            jnp.asarray(q), jnp.asarray(k[:, :8]), jnp.asarray(v[:, :8])
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_full_attention_matches_softmax(rng):
    B, L, S, H, D = 1, 6, 9, 2, 8
    q = rng.normal(size=(B, L, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, H, D)).astype(np.float32)
    v = rng.normal(size=(B, S, H, D)).astype(np.float32)
    got = np.asarray(attention.full_attention(*map(jnp.asarray, (q, k, v))))
    logits = np.einsum("blhd,bshd->bhls", q, k) / np.sqrt(D)
    a = np.exp(logits - logits.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    want = np.einsum("bhls,bshd->blhd", a, v)
    np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------- dual softmax + extraction ----------------


def test_dual_softmax_reference(rng):
    B, L, S, C = 1, 10, 14, 16
    f0 = rng.normal(size=(B, L, C)).astype(np.float32)
    f1 = rng.normal(size=(B, S, C)).astype(np.float32)
    T = 0.08
    got = np.asarray(matching.dual_softmax(jnp.asarray(f0), jnp.asarray(f1), T))
    sim = np.einsum("blc,bsc->bls", f0 / np.sqrt(C), f1 / np.sqrt(C)) / (T + 1e-4)
    sm1 = np.exp(sim - sim.max(1, keepdims=True))
    sm1 = sm1 / sm1.sum(1, keepdims=True)
    sm2 = np.exp(sim - sim.max(2, keepdims=True))
    sm2 = sm2 / sm2.sum(2, keepdims=True)
    np.testing.assert_allclose(got, sm1 * sm2, atol=1e-5)
    assert got.min() >= 0 and got.max() <= 1


def test_extract_matches_identity():
    """A nearly-diagonal conf matrix should produce the diagonal matches."""
    L = S = 12
    conf = np.full((1, L, S), 0.001, np.float32)
    for i in range(8):
        conf[0, i, i] = 0.5 + 0.01 * i  # 8 strong mutual matches
    m = matching.extract_matches(jnp.asarray(conf), threshold=0.1, max_matches=16)
    got = sorted(
        (int(i), int(j))
        for i, j, v in zip(m.i_ids[0], m.j_ids[0], m.valid[0])
        if v
    )
    assert got == [(i, i) for i in range(8)]
    # capacity slots beyond the 8 real matches are invalid
    assert int(m.valid.sum()) == 8
    # ranked by confidence: first slot is the strongest match (i=7)
    assert int(m.i_ids[0, 0]) == 7


def test_extract_matches_mutual_only():
    """Row argmax that isn't also col argmax must be rejected."""
    conf = np.full((1, 3, 3), 0.001, np.float32)
    conf[0, 0, 2] = 0.6  # row 0 -> col 2
    conf[0, 1, 2] = 0.7  # row 1 -> col 2 (wins the column)
    m = matching.extract_matches(jnp.asarray(conf), threshold=0.1, max_matches=4)
    got = {(int(i), int(j)) for i, j, v in zip(m.i_ids[0], m.j_ids[0], m.valid[0]) if v}
    assert got == {(1, 2)}


def test_extract_matches_border_mask():
    h = w = 6
    conf = np.full((1, 4, h * w), 0.001, np.float32)
    conf[0, 0, 0] = 0.9          # j=0 is in the border -> must be masked
    conf[0, 1, 2 * w + 2] = 0.9  # interior cell -> kept
    border = matching.grid_border_mask((h, w), 2)
    m = matching.extract_matches(
        jnp.asarray(conf), threshold=0.1, max_matches=4, border_mask_cols=border
    )
    got = {(int(i), int(j)) for i, j, v in zip(m.i_ids[0], m.j_ids[0], m.valid[0]) if v}
    assert got == {(1, 2 * w + 2)}


def test_grid_coords():
    j = jnp.asarray([[0, 1, 64, 65]])
    uv = np.asarray(matching.grid_coords(j, grid_w=64, stride=8.0))
    np.testing.assert_allclose(uv[0], [[0, 0], [8, 0], [0, 8], [8, 8]])


def test_spatial_expectation_peak():
    W = 5
    hm = np.zeros((3, W, W), np.float32)
    hm[0, 2, 2] = 1.0  # center -> (0, 0)
    hm[1, 2, 4] = 1.0  # right edge -> x=+1
    hm[2, 0, 2] = 1.0  # top edge -> y=-1
    coords, std = matching.spatial_expectation(jnp.asarray(hm))
    coords = np.asarray(coords)
    np.testing.assert_allclose(coords[0], [0, 0], atol=1e-6)
    np.testing.assert_allclose(coords[1], [1, 0], atol=1e-6)
    np.testing.assert_allclose(coords[2], [0, -1], atol=1e-6)
    assert np.all(np.asarray(std) < 1e-3)  # delta peaks -> zero std


def test_spatial_expectation_uniform_std():
    W = 5
    hm = np.full((1, W, W), 1.0 / (W * W), np.float32)
    coords, std = matching.spatial_expectation(jnp.asarray(hm))
    np.testing.assert_allclose(np.asarray(coords)[0], [0, 0], atol=1e-6)
    assert float(std[0]) > 1.0  # high uncertainty


# ---------------- window gather ----------------


def test_gather_windows_matches_manual(rng):
    B, Hf, Wf, C = 1, 16, 16, 3
    Hc, Wc = 4, 4  # stride ratio 4
    W = 5
    feat = rng.normal(size=(B, Hf, Wf, C)).astype(np.float32)
    j_ids = jnp.asarray([[0, 5, 15]])  # corner, middle, far corner
    out = np.asarray(
        windows.gather_windows(jnp.asarray(feat), j_ids, (Hc, Wc), W)
    )
    assert out.shape == (1, 3, W * W, C)
    pad = W // 2
    fpad = np.pad(feat, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    for n, j in enumerate([0, 5, 15]):
        yc, xc = divmod(j, Wc)
        manual = fpad[0, yc * 4 : yc * 4 + W, xc * 4 : xc * 4 + W].reshape(W * W, C)
        np.testing.assert_allclose(out[0, n], manual)


def test_gather_windows_center_alignment(rng):
    """The window center cell equals feat at the coarse cell's fine coords."""
    B, Hf, Wf, C = 1, 8, 8, 2
    feat = rng.normal(size=(B, Hf, Wf, C)).astype(np.float32)
    W = 5
    j = 1 * 4 + 2  # yc=1, xc=2 on a 4x4 coarse grid (r=2)
    out = np.asarray(
        windows.gather_windows(jnp.asarray(feat), jnp.asarray([[j]]), (4, 4), W)
    )
    center = out[0, 0, W * W // 2]
    np.testing.assert_allclose(center, feat[0, 1 * 2, 2 * 2])


def test_gather_windows_custom_vjp_matches_autodiff(rng):
    """The hand-written backward (row scatter + W^2 strided folds) must
    equal autodiff of the plain gather implementation."""
    import jax

    from onepose_st_tpu.ops import windows as window_ops

    B, Hf, Wf, C = 2, 16, 16, 6
    Hc = Wc = 4
    W = 5
    K = 7
    feat = jnp.asarray(rng.normal(size=(B, Hf, Wf, C)).astype(np.float32))
    j_ids = jnp.asarray(
        rng.integers(0, Hc * Wc, size=(B, K)).astype(np.int32)
    )
    # duplicates must accumulate
    j_ids = j_ids.at[0, 1].set(j_ids[0, 0])
    cot = jnp.asarray(
        rng.normal(size=(B, K, W * W, C)).astype(np.float32)
    )

    def loss_custom(f):
        return jnp.sum(window_ops.gather_windows(f, j_ids, (Hc, Wc), W) * cot)

    def loss_ref(f):
        return jnp.sum(
            window_ops._gather_impl(f, j_ids, (Hc, Wc), W) * cot
        )

    np.testing.assert_allclose(
        float(loss_custom(feat)), float(loss_ref(feat)), rtol=1e-5
    )
    g_c = jax.grad(loss_custom)(feat)
    g_r = jax.grad(loss_ref)(feat)
    np.testing.assert_allclose(
        np.asarray(g_c), np.asarray(g_r), rtol=1e-4, atol=1e-5
    )
