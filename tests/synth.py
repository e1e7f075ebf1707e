"""Synthetic data builders for end-to-end tests.

Constructs small but structurally faithful versions of the files the
pipeline consumes/produces: ckd-definition models, CKDMIP-style scenario
files, and high-resolution absorption-spectra files (the format read by
read_spectrum, ref src/ecckd/read_spectrum.cpp:19-87).
"""

import numpy as np

from ecckd_tpu.models import CkdModel, GasData, ConcDependence
from ecckd_tpu.io import NcWriter
from ecckd_tpu.ops import planck_function


def synth_lw_ckd_model(ng=8, nt=5, npress=10, nwav=40, seed=0):
    """A small LW CkdModel with smooth synthetic LUTs."""
    rng = np.random.default_rng(seed)
    pressure = np.exp(np.linspace(np.log(100.0), np.log(1.0e5), npress))
    # Temperature grid varies with pressure (like CKDMIP Idealized)
    t_ref = 200.0 + 80.0 * (np.log(pressure / 100.0)
                            / np.log(1.0e5 / 100.0))
    temperature = t_ref[None, :] + np.linspace(-40, 40, nt)[:, None]

    wav1 = np.linspace(0.0, 2000.0, nwav + 1)[:-1]
    wav2 = np.linspace(0.0, 2000.0, nwav + 1)[1:]
    gpoint_fraction = np.zeros((ng, nwav))
    # Contiguous blocks of the spectrum per g-point
    edges = np.linspace(0, nwav, ng + 1).astype(int)
    for ig in range(ng):
        gpoint_fraction[ig, edges[ig]:edges[ig + 1]] = 1.0

    band1 = np.array([0.0])
    band2 = np.array([2000.0])
    band_number = np.zeros(ng, np.int32)

    temperature_planck = np.linspace(120.0, 350.0, 24)
    # Planck LUT per g: integral over member wavenumbers
    wav_mid = 0.5 * (wav1 + wav2)
    dwav = wav2 - wav1
    pf_wav = np.asarray(planck_function(temperature_planck, wav_mid, dwav))
    planck_lut = pf_wav @ gpoint_fraction.T

    def make_lut(scale, tdep, pdep):
        k = scale * np.exp(
            tdep * (temperature - temperature.mean())[:, :, None] / 50.0
            + pdep * np.log(pressure / pressure[-1])[None, :, None]
            + np.linspace(-3.0, 1.5, ng)[None, None, :])
        return k

    h2o = GasData("h2o", ConcDependence.LINEAR,
                  molar_abs=make_lut(2e-3, 0.4, -0.2))
    h2o.min_molar_abs = h2o.molar_abs * 0.2
    h2o.max_molar_abs = h2o.molar_abs * 5.0

    composite = GasData("composite", ConcDependence.NONE,
                        molar_abs=make_lut(1e-6, 0.1, 0.3))
    composite.min_molar_abs = composite.molar_abs * 0.3
    composite.max_molar_abs = composite.molar_abs * 3.0
    composite.composite_vmr = np.vstack(
        [np.full(npress, 4.0e-4), np.full(npress, 1.8e-6)])
    composite.composite_molecules = "co2 ch4"

    co2 = GasData("co2", ConcDependence.RELATIVE_LINEAR,
                  molar_abs=make_lut(1e-4, 0.2, 0.1),
                  reference_vmr=4.0e-4)
    co2.min_molar_abs = co2.molar_abs * 0.5
    co2.max_molar_abs = co2.molar_abs * 2.0

    return CkdModel(
        [composite, h2o, co2], pressure, temperature, wav1, wav2,
        gpoint_fraction, band1, band2, band_number,
        temperature_planck=temperature_planck, planck_function=planck_lut,
        model_id="synth-lw-test")


def synth_sw_ckd_model(ng=8, nt=5, npress=10, nwav=40, seed=1):
    rng = np.random.default_rng(seed)
    lw = synth_lw_ckd_model(ng, nt, npress, nwav, seed)
    # SW spectral range: 250-50000 cm-1
    wav1 = np.linspace(250.0, 50000.0, nwav + 1)[:-1]
    wav2 = np.linspace(250.0, 50000.0, nwav + 1)[1:]
    ssi = np.linspace(5.0, 50.0, nwav)
    solar_irradiance = lw.gpoint_fraction @ ssi
    model = CkdModel(
        lw.single_gas_data, np.exp(lw.log_pressure), lw.temperature,
        wav1, wav2, lw.gpoint_fraction, np.array([250.0]),
        np.array([50000.0]), lw.band_number,
        solar_irradiance=solar_irradiance, ssi=ssi,
        reference_total_solar_irradiance=float(solar_irradiance.sum()),
        model_id="synth-sw-test")
    return model


def synth_scenario_file(path, ncol=3, nlay=15, seed=2,
                        gases=("h2o", "co2")):
    """CKDMIP-style scenario concentrations file (run_ckd input)."""
    rng = np.random.default_rng(seed)
    pressure_hl = np.zeros((ncol, nlay + 1))
    temperature_hl = np.zeros((ncol, nlay + 1))
    for icol in range(ncol):
        pressure_hl[icol] = np.linspace(100.0 * (1 + icol), 1.013e5, nlay + 1)
        temperature_hl[icol] = (np.linspace(215.0, 288.0, nlay + 1)
                                + 5.0 * icol)
    vmrs = {
        "h2o": 4e-6 + 8e-3 * (pressure_hl[:, 1:] / 1.013e5) ** 3,
        "co2": np.full((ncol, nlay), 4.15e-4),
        "o3": 1e-7 * np.exp(-((np.log(pressure_hl[:, 1:] / 2000.0)) ** 2)),
        "ch4": np.full((ncol, nlay), 1.8e-6),
    }
    with NcWriter(path) as w:
        w.define_dimension("column", ncol)
        w.define_dimension("half_level", nlay + 1)
        w.define_dimension("level", nlay)
        w.define_variable("pressure_hl", "double", "column", "half_level")
        w.define_variable("temperature_hl", "double", "column", "half_level")
        w.write(pressure_hl, "pressure_hl")
        w.write(temperature_hl, "temperature_hl")
        for gas in gases:
            name = f"{gas}_mole_fraction_fl"
            w.define_variable(name, "double", "column", "level")
            w.write(vmrs[gas][:, :nlay], name)
        w.write_attribute("synthetic test scenario", "experiment")
        w.write_attribute("synth-1", "experiment_id")
        w.write_attribute("", "sub_experiment")
        w.write_attribute("", "sub_experiment_id")
    return path


def synth_spectrum_file(path, molecule="h2o", ncol=5, nlay=15, nwav=2048,
                        seed=3, is_sw=False, vmr_value=None, od_scale=1.0):
    """CKDMIP-style high-res absorption spectrum file (read_spectrum input).

    Layout follows read_spectrum.cpp:19-87: pressure_hl (col, half_level),
    temperature_hl, wavenumber, d_wavenumber, optical_depth (layer, wav)
    per column, reference_surface_mole_fraction, mole_fraction_fl.
    """
    rng = np.random.default_rng(seed)
    pressure_hl = np.zeros((ncol, nlay + 1))
    temperature_hl = np.zeros((ncol, nlay + 1))
    for icol in range(ncol):
        # Log-even pressure grid like the CKDMIP Idealized dataset, so the
        # resulting LUT satisfies calc_optical_depth's even-log assumption
        pressure_hl[icol] = np.exp(np.linspace(np.log(100.0),
                                               np.log(1.013e5), nlay + 1))
        temperature_hl[icol] = np.linspace(210.0 + 8 * icol,
                                           284.0 + 8 * icol, nlay + 1)
    if is_sw:
        wavenumber = np.linspace(250.0, 50000.0, nwav)
    else:
        wavenumber = np.linspace(1.0, 2000.0, nwav)
    d_wavenumber = np.gradient(wavenumber)

    # Synthetic absorption: lines of varying strength on a continuum
    k = np.full(nwav, 1e-4)
    nlines = 60
    centers = rng.uniform(wavenumber[0], wavenumber[-1], nlines)
    strengths = 10.0 ** rng.uniform(-1, 3.5, nlines)
    widths = rng.uniform(2, 30, nlines) * (wavenumber[-1] - wavenumber[0]) / 2000.0
    for c0, s, wd in zip(centers, strengths, widths):
        k = k + s / (1.0 + ((wavenumber - c0) / wd) ** 2)

    vmr = vmr_value if vmr_value is not None else 0.01
    col_mass = (pressure_hl[:, 1:] - pressure_hl[:, :-1]) / 9.80665 / 0.02897
    with NcWriter(path) as w:
        w.define_dimension("column", None)
        w.define_dimension("half_level", nlay + 1)
        w.define_dimension("level", nlay)
        w.define_dimension("wavenumber", nwav)
        w.define_variable("pressure_hl", "double", "column", "half_level")
        w.define_variable("temperature_hl", "double", "column", "half_level")
        w.define_variable("wavenumber", "double", "wavenumber")
        w.define_variable("d_wavenumber", "double", "wavenumber")
        w.define_variable("optical_depth", "float", "column", "level",
                          "wavenumber")
        w.define_variable("reference_surface_mole_fraction", "double")
        w.define_variable("mole_fraction_fl", "double", "column", "level")
        w.write(wavenumber, "wavenumber")
        w.write(d_wavenumber, "d_wavenumber")
        w.write(vmr, "reference_surface_mole_fraction")
        for icol in range(ncol):
            w.write(pressure_hl[icol], "pressure_hl", index=icol)
            w.write(temperature_hl[icol], "temperature_hl", index=icol)
            # od grows with pressure thickness and temperature scaling per col
            tfact = np.exp(0.02 * (temperature_hl[icol, 1:, None] - 250.0))
            od = (od_scale * vmr * col_mass[icol][:, None] * 1e-3
                  * k[None, :] * tfact)
            w.write(od.astype(np.float32), "optical_depth", index=icol)
            w.write(np.full(nlay, vmr), "mole_fraction_fl", index=icol)
        w.write_attribute(molecule, "constituent_id")
        w.write_attribute("synthetic spectrum", "title")
    return path


def synth_lbl_flux_file(path, spectrum_files, gpoint_file, molecules,
                        iprofiles=(0,)):
    """Synthetic LW LBL training-flux file in the CKDMIP format LblFluxes
    reads (ref lbl_fluxes.cpp:253-350): spectral fluxes per g-point computed
    from the high-res spectra via the merged g-point map."""
    import jax
    from ecckd_tpu.io import read_spectrum, NcFile
    from ecckd_tpu.ops import planck_function, rt_lw

    f = NcFile(gpoint_file)
    g_point = np.asarray(f.read("g_point"), np.int64)
    ng = int(g_point.max()) + 1
    f.close()

    ncol = len(iprofiles)
    rows = {k: [] for k in ("p", "t", "vmr", "fd", "fu", "sfd", "sfu")}
    for iprof in iprofiles:
        sps = [read_spectrum(fn, iprof) for fn in spectrum_files]
        sp0 = sps[0]
        od = np.sum([sp.optical_depth for sp in sps], axis=0)
        planck_hl = np.asarray(planck_function(
            sp0.temperature_hl, sp0.wavenumber, sp0.d_wavenumber))
        fd, fu = rt_lw(planck_hl, od, np.ones_like(sp0.wavenumber),
                       planck_hl[-1])
        fd, fu = np.asarray(fd), np.asarray(fu)
        onehot = (g_point[:, None] == np.arange(ng)[None, :]).astype(float)
        rows["p"].append(sp0.pressure_hl)
        rows["t"].append(sp0.temperature_hl)
        rows["vmr"].append(np.stack([sp.vmr_fl for sp in sps]))
        rows["fd"].append(fd.sum(-1))
        rows["fu"].append(fu.sum(-1))
        rows["sfd"].append(fd @ onehot)
        rows["sfu"].append(fu @ onehot)

    nlay = rows["vmr"][0].shape[1]
    with NcWriter(path) as w:
        w.define_dimension("column", ncol)
        w.define_dimension("half_level", nlay + 1)
        w.define_dimension("level", nlay)
        w.define_dimension("gas", len(spectrum_files))
        w.define_dimension("g_point", ng)
        w.define_variable("pressure_hl", "double", "column", "half_level")
        w.define_variable("temperature_hl", "double", "column", "half_level")
        w.define_variable("mole_fraction_fl", "double", "column", "gas",
                          "level")
        w.define_variable("flux_dn_lw", "double", "column", "half_level")
        w.define_variable("flux_up_lw", "double", "column", "half_level")
        w.define_variable("spectral_flux_dn_lw", "double", "column",
                          "half_level", "g_point")
        w.define_variable("spectral_flux_up_lw", "double", "column",
                          "half_level", "g_point")
        w.write(np.stack(rows["p"]), "pressure_hl")
        w.write(np.stack(rows["t"]), "temperature_hl")
        w.write(np.stack(rows["vmr"]), "mole_fraction_fl")
        w.write(np.stack(rows["fd"]), "flux_dn_lw")
        w.write(np.stack(rows["fu"]), "flux_up_lw")
        w.write(np.stack(rows["sfd"]), "spectral_flux_dn_lw")
        w.write(np.stack(rows["sfu"]), "spectral_flux_up_lw")
        w.write_attribute(" ".join(molecules), "constituent_id")
    return path


def synth_ssi_file(path, wavenumber):
    """Solar spectral irradiance file (reorder/find_g_points/create_lut SW
    input): solar_spectral_irradiance per wavenumber + total."""
    ssi = 20.0 * np.exp(-((wavenumber - 20000.0) / 15000.0) ** 2) + 0.5
    ssi = ssi * (1361.0 / ssi.sum())
    with NcWriter(path) as w:
        w.define_dimension("wavenumber", len(wavenumber))
        w.define_variable("wavenumber", "double", "wavenumber")
        w.define_variable("solar_spectral_irradiance", "double", "wavenumber")
        w.define_variable("total_solar_irradiance", "double")
        w.write(wavenumber, "wavenumber")
        w.write(ssi, "solar_spectral_irradiance")
        w.write(float(ssi.sum()), "total_solar_irradiance")
    return path, ssi


def synth_sw_lbl_flux_file(path, spectrum_files, gpoint_file, molecules,
                           ssi, iprofiles=(0,)):
    """Synthetic SW LBL training-flux file in the CKDMIP format LblFluxes
    reads (ref lbl_fluxes.cpp:70-180): per-(column, mu0) direct-beam fluxes
    plus no-Rayleigh upwelling, spectral fluxes per g-point."""
    import jax
    from ecckd_tpu.io import read_spectrum, NcFile
    from ecckd_tpu.ops import rt_norayleigh_sw

    f = NcFile(gpoint_file)
    g_point = np.asarray(f.read("g_point"), np.int64)
    ng = int(g_point.max()) + 1
    f.close()
    onehot = (g_point[:, None] == np.arange(ng)[None, :]).astype(float)

    mu0_all = np.array([0.9, 0.7, 0.5, 0.3, 0.1])
    albedo_value = 0.15

    ncol = len(iprofiles)
    nmu0 = len(mu0_all)
    first = read_spectrum(spectrum_files[0], 0)
    nlay = first.optical_depth.shape[0]
    nwav = len(first.wavenumber)
    albedo = np.full(nwav, albedo_value)

    fd_all = np.zeros((ncol, nmu0, nlay + 1))
    fu_all = np.zeros((ncol, nmu0, nlay + 1))
    sfd_all = np.zeros((ncol, nmu0, nlay + 1, ng))
    sfu_all = np.zeros((ncol, nmu0, nlay + 1, ng))
    p_rows, t_rows, vmr_rows = [], [], []
    for ic, iprof in enumerate(iprofiles):
        sps = [read_spectrum(fn, iprof) for fn in spectrum_files]
        od = np.sum([sp.optical_depth for sp in sps], axis=0)
        p_rows.append(sps[0].pressure_hl)
        t_rows.append(sps[0].temperature_hl)
        vmr_rows.append(np.stack([sp.vmr_fl for sp in sps]))
        for im, mu0 in enumerate(mu0_all):
            fd, fu = rt_norayleigh_sw(float(mu0), ssi, od, albedo)
            fd, fu = np.asarray(fd), np.asarray(fu)
            fd_all[ic, im] = fd.sum(-1)
            fu_all[ic, im] = fu.sum(-1)
            sfd_all[ic, im] = fd @ onehot
            sfu_all[ic, im] = fu @ onehot

    with NcWriter(path) as w:
        w.define_dimension("column", ncol)
        w.define_dimension("mu0", nmu0)
        w.define_dimension("half_level", nlay + 1)
        w.define_dimension("level", nlay)
        w.define_dimension("gas", len(spectrum_files))
        w.define_dimension("g_point", ng)
        w.define_variable("mu0", "double", "mu0")
        w.define_variable("pressure_hl", "double", "column", "half_level")
        w.define_variable("temperature_hl", "double", "column",
                          "half_level")
        w.define_variable("mole_fraction_fl", "double", "column", "gas",
                          "level")
        w.define_variable("flux_dn_direct_sw", "double", "column", "mu0",
                          "half_level")
        w.define_variable("flux_up_sw", "double", "column", "mu0",
                          "half_level")
        w.define_variable("spectral_flux_dn_direct_sw", "double", "column",
                          "mu0", "half_level", "g_point")
        w.define_variable("spectral_flux_up_sw", "double", "column", "mu0",
                          "half_level", "g_point")
        w.write(mu0_all, "mu0")
        w.write(np.stack(p_rows), "pressure_hl")
        w.write(np.stack(t_rows), "temperature_hl")
        w.write(np.stack(vmr_rows), "mole_fraction_fl")
        w.write(fd_all, "flux_dn_direct_sw")
        w.write(fu_all, "flux_up_sw")
        w.write(sfd_all, "spectral_flux_dn_direct_sw")
        w.write(sfu_all, "spectral_flux_up_sw")
        w.write_attribute(" ".join(molecules), "constituent_id")
    return path
