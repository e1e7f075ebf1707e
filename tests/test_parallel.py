"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def has_devices(n):
    return len(jax.devices()) >= n


@pytest.mark.skipif(not has_devices(8), reason="needs 8 devices")
class TestMesh:
    def test_make_mesh_shapes(self):
        from ecckd_tpu.parallel import make_mesh
        mesh = make_mesh(8)
        assert mesh.devices.size == 8
        assert set(mesh.axis_names) == {"data", "spectral"}
        mesh2 = make_mesh(8, data_parallel=4)
        assert mesh2.shape["data"] == 4 and mesh2.shape["spectral"] == 2

    def test_spectral_sharded_interval_sum(self):
        """Wavenumber-sharded prefix-sum reduction matches replicated."""
        from ecckd_tpu.parallel import make_mesh, spectral_sharding
        from ecckd_tpu.ops.segments import interval_sum
        mesh = make_mesh(8, data_parallel=1)
        nwav = 1024
        v = np.random.default_rng(0).normal(size=(5, nwav))
        i1 = np.array([0, 100, 500], np.int32)
        i2 = np.array([99, 499, nwav - 1], np.int32)
        expected = np.asarray(interval_sum(v, i1, i2))
        v_sharded = jax.device_put(jnp.asarray(v),
                                   spectral_sharding(mesh, 2, -1))
        out = jax.jit(interval_sum)(v_sharded, jnp.asarray(i1),
                                    jnp.asarray(i2))
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-12)

    def test_profile_sharded_rt(self):
        """Profile-sharded vmapped RT matches single-device run."""
        from ecckd_tpu.parallel import make_mesh, profile_sharding, replicated
        from ecckd_tpu.ops import rt_lw
        mesh = make_mesh(8)
        ncol, nlay, ng = 16, 10, 8
        rng = np.random.default_rng(1)
        planck = np.abs(rng.normal(5, 1, (ncol, nlay + 1, ng)))
        od = np.abs(rng.normal(0.3, 0.2, (ncol, nlay, ng)))
        emis = np.ones(ng)
        surf = np.abs(rng.normal(10, 1, (ncol, ng)))

        def batch(p, o, s):
            return jax.vmap(lambda a, b, c: rt_lw(a, b, emis, c))(p, o, s)

        fd_ref, fu_ref = jax.jit(batch)(planck, od, surf)
        p_sh = jax.device_put(jnp.asarray(planck),
                              profile_sharding(mesh, 3, 0))
        o_sh = jax.device_put(jnp.asarray(od), profile_sharding(mesh, 3, 0))
        s_sh = jax.device_put(jnp.asarray(surf), profile_sharding(mesh, 2, 0))
        with mesh:
            fd, fu = jax.jit(batch)(p_sh, o_sh, s_sh)
        np.testing.assert_allclose(np.asarray(fd), np.asarray(fd_ref),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(fu), np.asarray(fu_ref),
                                   rtol=1e-12)


@pytest.mark.skipif(not has_devices(8), reason="needs 8 devices")
class TestDryrun:
    def test_dryrun_multichip(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        for o in out:
            assert np.all(np.isfinite(np.asarray(o)))
