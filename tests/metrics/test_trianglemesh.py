import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.metrics import trianglemesh as tm
from kaolin_tpu.ops.mesh import index_vertices_by_faces


def test_point_to_mesh_distance_doc_example():
    """Reference docstring example (metrics/trianglemesh.py:60-76)."""
    point = jnp.asarray([[[0.5, 0.5, 0.5], [3., 4., 5.]]])
    vertices = jnp.asarray([[[0., 0., 0.], [0., 1., 0.], [0., 0., 1.]]])
    faces = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
    fv = index_vertices_by_faces(vertices, faces)
    dist, idx, dtype_ = tm.point_to_mesh_distance(point, fv)
    np.testing.assert_allclose(dist[0], [0.25, 41.0], rtol=1e-5)
    np.testing.assert_array_equal(idx[0], [0, 0])


def _naive_p2m(points, fv):
    """Brute force: min over faces of exact point-triangle sq distance."""
    from scipy.spatial import distance  # noqa: F401 (just ensures scipy avail)
    n = points.shape[0]
    f = fv.shape[0]
    out = np.zeros(n)
    for i in range(n):
        best = np.inf
        for j in range(f):
            best = min(best, _pt_tri_sq(points[i], fv[j]))
        out[i] = best
    return out


def _pt_tri_sq(p, tri):
    # Ericson closest-point-on-triangle
    a, b, c = tri
    ab, ac, ap = b - a, c - a, p - a
    d1, d2 = ab @ ap, ac @ ap
    if d1 <= 0 and d2 <= 0:
        return np.sum((p - a) ** 2)
    bp = p - b
    d3, d4 = ab @ bp, ac @ bp
    if d3 >= 0 and d4 <= d3:
        return np.sum((p - b) ** 2)
    vc = d1 * d4 - d3 * d2
    if vc <= 0 and d1 >= 0 and d3 <= 0:
        v = d1 / (d1 - d3)
        return np.sum((p - (a + v * ab)) ** 2)
    cp = p - c
    d5, d6 = ab @ cp, ac @ cp
    if d6 >= 0 and d5 <= d6:
        return np.sum((p - c) ** 2)
    vb = d5 * d2 - d1 * d6
    if vb <= 0 and d2 >= 0 and d6 <= 0:
        w = d2 / (d2 - d6)
        return np.sum((p - (a + w * ac)) ** 2)
    va = d3 * d6 - d5 * d4
    if va <= 0 and (d4 - d3) >= 0 and (d5 - d6) >= 0:
        w = (d4 - d3) / ((d4 - d3) + (d5 - d6))
        return np.sum((p - (b + w * (c - b))) ** 2)
    denom = 1.0 / (va + vb + vc)
    v = vb * denom
    w = vc * denom
    return np.sum((p - (a + ab * v + ac * w)) ** 2)


def test_point_to_mesh_distance_random(key):
    k1, k2 = jax.random.split(key)
    points = jax.random.normal(k1, (1, 50, 3))
    verts = jax.random.normal(k2, (1, 20, 3))
    # non-degenerate faces: 3 distinct vertex ids per face
    rng = np.random.RandomState(3)
    faces = jnp.asarray(np.stack([rng.choice(20, 3, replace=False)
                                  for _ in range(30)]))
    fv = jnp.take(verts, faces, axis=1)
    dist, idx, tcode = tm.point_to_mesh_distance(points, fv)
    want = _naive_p2m(np.asarray(points[0]), np.asarray(fv[0]))
    np.testing.assert_allclose(dist[0], want, rtol=1e-3, atol=1e-5)


def test_point_to_mesh_grad(key):
    points = jax.random.normal(key, (1, 10, 3))
    verts = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 3))
    faces = jax.random.randint(jax.random.fold_in(key, 2), (6, 3), 0, 8)
    fv = jnp.take(verts, faces, axis=1)

    def loss(p, f):
        return jnp.sum(tm.point_to_mesh_distance(p, f)[0])

    gp, gf = jax.grad(loss, argnums=(0, 1))(points, fv)
    assert np.isfinite(np.asarray(gp)).all()
    eps = 1e-3
    num = (loss(points.at[0, 0, 0].add(eps), fv)
           - loss(points.at[0, 0, 0].add(-eps), fv)) / (2 * eps)
    np.testing.assert_allclose(gp[0, 0, 0], num, rtol=5e-2, atol=1e-3)


def test_average_edge_length():
    verts = jnp.asarray([[[0., 0., 0.], [1., 0., 0.], [0., 1., 0.]]])
    faces = jnp.asarray([[0, 1, 2]])
    ael = tm.average_edge_length(verts, faces)
    np.testing.assert_allclose(ael[0, 0], (1 + 1 + np.sqrt(2)) / 3, rtol=1e-6)
