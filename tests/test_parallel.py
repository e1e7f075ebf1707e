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


@pytest.mark.skipif(not has_devices(8), reason="needs 8 devices")
class TestDataParallelSolve:
    def test_sharded_matches_unsharded(self, tmp_path):
        """solve(data_parallel=True) must give the same optimum."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from synth import (synth_spectrum_file, synth_lbl_flux_file)
        from ecckd_tpu.config import Config
        from ecckd_tpu.tools.reorder_spectrum import reorder_spectrum
        from ecckd_tpu.tools.find_g_points import find_g_points
        from ecckd_tpu.tools.create_lut import create_lut
        from ecckd_tpu.models import CkdModel
        from ecckd_tpu.io.lbl_fluxes import LblFluxes
        from ecckd_tpu.optimize import solve
        from ecckd_tpu.tools.optimize_lut import _prepare_lbl

        d = tmp_path
        h2o = synth_spectrum_file(str(d / "h2o.h5"), nwav=512, ncol=6)
        order = str(d / "o.h5")
        reorder_spectrum(Config({"input": h2o, "output": order}), argv=["r"])
        gp = str(d / "g.h5")
        find_g_points(Config({
            "output": gp, "gases": "h2o", "heating_rate_tolerance": "0.4",
            "averaging_method": "transmission",
            "h2o.reordering_input": order, "h2o.input": h2o}), argv=["f"])
        lut = str(d / "l.nc")
        create_lut(Config({
            "input": gp, "output": lut, "gases": "h2o",
            "averaging_method": "transmission",
            "h2o.conc_dependence": "linear", "h2o.input": h2o}), argv=["c"])
        training = str(d / "t.nc")
        # 4 profiles -> divisible across 2/4 devices
        synth_lbl_flux_file(training, [h2o], gp, ["h2o"],
                            iprofiles=(0, 1, 2, 3))

        results = {}
        for dp in (False, True):
            model = CkdModel.read(lut, active_gas_list=["h2o"])
            model.create_error_covariances(prior_error=4.0)
            lbl = LblFluxes.read(training)
            _prepare_lbl(lbl, model, 1e4)
            res = solve(model, [lbl], max_iterations=15, prior_error=4.0,
                        data_parallel=dp)
            results[dp] = (res.cost, model.gas("h2o").molar_abs.copy())
        np.testing.assert_allclose(results[True][0], results[False][0],
                                   rtol=1e-8)
        np.testing.assert_allclose(results[True][1], results[False][1],
                                   rtol=1e-6)

    def test_padded_sharding_uses_all_devices(self, tmp_path):
        """A non-divisible profile count (5 on 8 devices) is padded with
        zero-weight copies: every device holds a shard and the cost and
        gradient are bit-equal to the unsharded evaluation."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from synth import (synth_spectrum_file, synth_lbl_flux_file)
        from ecckd_tpu.config import Config
        from ecckd_tpu.tools.reorder_spectrum import reorder_spectrum
        from ecckd_tpu.tools.find_g_points import find_g_points
        from ecckd_tpu.tools.create_lut import create_lut
        from ecckd_tpu.models import CkdModel
        from ecckd_tpu.io.lbl_fluxes import LblFluxes
        from ecckd_tpu.optimize import (build_scene, make_cost_fn,
                                        log_state_tree)
        from ecckd_tpu.optimize.solver import _shard_scene_profiles
        from ecckd_tpu.ops.cost import CostWeights
        from ecckd_tpu.tools.optimize_lut import _prepare_lbl

        d = tmp_path
        h2o = synth_spectrum_file(str(d / "h2o.h5"), nwav=512, ncol=6)
        order = str(d / "o.h5")
        reorder_spectrum(Config({"input": h2o, "output": order}), argv=["r"])
        gp = str(d / "g.h5")
        find_g_points(Config({
            "output": gp, "gases": "h2o", "heating_rate_tolerance": "0.4",
            "averaging_method": "transmission",
            "h2o.reordering_input": order, "h2o.input": h2o}), argv=["f"])
        lut = str(d / "l.nc")
        create_lut(Config({
            "input": gp, "output": lut, "gases": "h2o",
            "averaging_method": "transmission",
            "h2o.conc_dependence": "linear", "h2o.input": h2o}), argv=["c"])
        training = str(d / "t.nc")
        synth_lbl_flux_file(training, [h2o], gp, ["h2o"],
                            iprofiles=(0, 1, 2, 3, 4))   # 5 % 8 != 0

        model = CkdModel.read(lut, active_gas_list=["h2o"])
        lbl = LblFluxes.read(training)
        _prepare_lbl(lbl, model, 1e4)
        scene, meta = build_scene(model, lbl)
        assert scene.pressure_hl.shape[0] == 5

        scene_sh, meta_sh = _shard_scene_profiles(scene, meta)
        assert scene_sh.pressure_hl.shape[0] == 8
        assert len(scene_sh.pressure_hl.sharding.device_set) == 8
        assert np.array_equal(meta_sh.profile_weight,
                              [1, 1, 1, 1, 1, 0, 0, 0])

        tree = {k: jnp.asarray(v) for k, v in log_state_tree(model).items()}
        val_ref, grad_ref = jax.value_and_grad(
            make_cost_fn(model, [(scene, meta)], CostWeights()))(tree)
        val_sh, grad_sh = jax.value_and_grad(
            make_cost_fn(model, [(scene_sh, meta_sh)], CostWeights()))(tree)
        np.testing.assert_allclose(float(val_sh), float(val_ref), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(grad_sh["h2o"]),
                                   np.asarray(grad_ref["h2o"]), rtol=1e-10,
                                   atol=1e-13)
