"""lw_spectra: generate LBL longwave benchmark fluxes.

TPU-native equivalent of src/ecckd/lw_spectra.cpp:25-272: for every profile
of a merged-spectra config, compute the Planck function and spectral LW
radiative transfer, writing fluxes at full spectral resolution or collapsed
to g-points; the column dimension is unlimited for concatenation.
"""

from __future__ import annotations

import sys

import numpy as np

from .. import logs
from ..config import Config
from ..io import NcFile, NcWriter
from ..io.spectrum import read_merged_spectrum
from ..ops.average import average_od_to_gpoints
from .common import tool_prologue, find_file, setup_jax


def lw_spectra(cfg: Config, argv=()) -> str:
    setup_jax(cfg)
    from ..ops import planck_function, rt_lw
    import jax

    output = cfg.read_string("output")
    g_point = None
    ng = -1
    gpoint_file = cfg.read_string("gpoints", default=None)
    if gpoint_file:
        f = NcFile(find_file(gpoint_file))
        g_point = np.asarray(f.read("g_point"), np.int64)
        ng = int(g_point.max()) + 1
        f.close()
    have_gpoints = g_point is not None

    iprofile = cfg.read_int("iprofile", default=None)
    do_one_profile = iprofile is not None

    ncol = 10000
    icol = iprofile if do_one_profile else 0
    is_first = True
    w = NcWriter(output)
    iout = 0

    while icol < ncol:
        logs.log(f"Profile {icol}")
        sp = read_merged_spectrum(cfg, icol, "")
        ncol = sp.ncol
        nlay, nwav = sp.optical_depth.shape

        if is_first:
            is_first = False
            w.define_dimension("column", None)    # unlimited for ncrcat
            w.define_dimension("level", nlay)
            w.define_dimension("half_level", nlay + 1)
            if not have_gpoints:
                spec_name = "wavenumber"
                w.define_dimension(spec_name, nwav)
            else:
                spec_name = "g_point"
                w.define_dimension(spec_name, ng)
            ngas = sp.vmr_fl.shape[0]
            w.define_dimension("gas", ngas)

            w.define_variable("pressure_hl", "float", "column", "half_level")
            w.write_long_name("Pressure at half levels", "pressure_hl")
            w.write_units("Pa", "pressure_hl")
            w.define_variable("temperature_hl", "float", "column",
                              "half_level")
            w.write_long_name("Temperature at half levels", "temperature_hl")
            w.write_units("K", "temperature_hl")
            if not have_gpoints:
                w.define_variable("wavenumber", "double", "wavenumber",
                                  deflate=2)
                w.write_long_name("Wavenumber", "wavenumber")
                w.write_units("cm-1", "wavenumber")
            w.define_variable("vmr_fl", "float", "column", "gas", "level")
            w.write_long_name("Volume mixing ratio", "vmr_fl")
            w.write_units("mol mol-1", "vmr_fl")
            w.define_variable("flux_dn_lw", "float", "column", "half_level")
            w.write_long_name("Downwelling longwave flux", "flux_dn_lw")
            w.write_units("W m-2", "flux_dn_lw")
            w.define_variable("flux_up_lw", "float", "column", "half_level")
            w.write_long_name("Upwelling longwave flux", "flux_up_lw")
            w.write_units("W m-2", "flux_up_lw")
            w.define_variable("optical_depth", "float", "column", "level",
                              spec_name)
            w.write_long_name("Layer optical depth", "optical_depth")
            w.define_variable("spectral_flux_dn_lw", "float", "column",
                              "half_level", spec_name)
            w.write_long_name("Downwelling longwave spectral flux",
                              "spectral_flux_dn_lw")
            w.write_units("W m-2", "spectral_flux_dn_lw")
            w.define_variable("spectral_flux_up_lw", "float", "column",
                              "half_level", spec_name)
            w.write_long_name("Upwelling longwave spectral flux",
                              "spectral_flux_up_lw")
            w.write_units("W m-2", "spectral_flux_up_lw")
            w.append_history(argv or sys.argv)
            w.write_attribute(sp.molecule.replace(",", " "), "molecules")
            w.write_attribute(cfg.sprint(), "config")
            if not have_gpoints:
                w.write(sp.wavenumber, "wavenumber")

        w.write(sp.pressure_hl, "pressure_hl", index=iout)
        w.write(sp.temperature_hl, "temperature_hl", index=iout)
        w.write(sp.vmr_fl, "vmr_fl", index=iout)

        logs.log("  Computing Planck function")
        planck_hl = np.asarray(planck_function(
            sp.temperature_hl, sp.wavenumber, sp.d_wavenumber))
        logs.log("  Performing longwave radiative transfer")
        fd, fu = rt_lw(planck_hl, sp.optical_depth,
                       np.ones(nwav), planck_hl[-1])
        fd, fu = np.asarray(fd), np.asarray(fu)
        w.write(fd.sum(1), "flux_dn_lw", index=iout)
        w.write(fu.sum(1), "flux_up_lw", index=iout)

        if not have_gpoints:
            w.write(sp.optical_depth, "optical_depth", index=iout)
            w.write(fd, "spectral_flux_dn_lw", index=iout)
            w.write(fu, "spectral_flux_up_lw", index=iout)
        else:
            pressure_fl = 0.5 * (sp.pressure_hl[:-1] + sp.pressure_hl[1:])
            t_x_p = sp.temperature_hl * sp.pressure_hl
            temperature_fl = 0.5 * (t_x_p[:-1] + t_x_p[1:]) / pressure_fl
            planck_fl = np.asarray(planck_function(
                temperature_fl, sp.wavenumber, sp.d_wavenumber))
            spectral_od, _, _ = average_od_to_gpoints(
                ng, g_point, sp.optical_depth, planck_fl, "transmission")
            onehot = (g_point[:, None]
                      == np.arange(ng)[None, :]).astype(np.float64)
            w.write(np.asarray(spectral_od), "optical_depth", index=iout)
            w.write(fd @ onehot, "spectral_flux_dn_lw", index=iout)
            w.write(fu @ onehot, "spectral_flux_up_lw", index=iout)

        if do_one_profile:
            break
        icol += 1
        iout += 1
    w.close()
    return output


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else list(argv)
    from ..errors import run_tool
    return run_tool(
        lambda: lw_spectra(tool_prologue(argv), argv=["lw_spectra"] + argv),
        name="lw_spectra")


if __name__ == "__main__":
    sys.exit(main())
