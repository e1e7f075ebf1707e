"""Readers for CKDMIP high-resolution absorption-spectra files.

TPU-native equivalents of read_spectrum (src/ecckd/read_spectrum.cpp:19-87)
and read_merged_spectrum (src/ecckd/read_merged_spectrum.cpp:19-190): load
one profile of layer x wavenumber optical depth, optionally summing several
gases with concentration scaling to target profiles.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from .. import logs
from ..config import Config
from .ncio import NcFile


@dataclasses.dataclass
class Spectrum:
    pressure_hl: np.ndarray          # (nlev+1,)
    temperature_hl: np.ndarray       # (nlev+1,)
    wavenumber: np.ndarray           # (nwav,) cm-1
    d_wavenumber: np.ndarray         # (nwav,) cm-1
    optical_depth: np.ndarray        # (nlay, nwav)
    molecule: str = ""
    reference_surface_vmr: float = -1.0
    vmr_fl: Optional[np.ndarray] = None   # (nlay,) or (ngas, nlay) merged
    ncol: int = 1


def _d_wavenumber_from_grid(wavenumber: np.ndarray) -> np.ndarray:
    """Central differences with halved end values
    (ref read_spectrum.cpp:55-63)."""
    d = np.empty_like(wavenumber)
    d[1:-1] = 0.5 * (wavenumber[2:] - wavenumber[:-2])
    d[0] = 0.5 * d[1]
    d[-1] = 0.5 * d[-2]
    return d


def read_spectrum(file_name: str, iprof: int) -> Spectrum:
    """Read one profile of spectral optical depth."""
    f = NcFile(file_name)
    ncol = f.size("pressure_hl")[0]
    pressure_hl = np.asarray(f.read("pressure_hl", index=iprof), np.float64)
    if f.exist("temperature_hl"):
        temperature_hl = np.asarray(f.read("temperature_hl", index=iprof),
                                    np.float64)
    else:
        logs.warning('"temperature_hl" not present')
        temperature_hl = np.zeros_like(pressure_hl)
    wavenumber = np.asarray(f.read("wavenumber"), np.float64)
    if f.exist("d_wavenumber"):
        d_wavenumber = np.asarray(f.read("d_wavenumber"), np.float64)
    else:
        d_wavenumber = _d_wavenumber_from_grid(wavenumber)
    molecule = f.attribute("constituent_id", default="") or ""
    if f.exist("reference_surface_mole_fraction"):
        ref_vmr = float(f.read_scalar("reference_surface_mole_fraction"))
    else:
        ref_vmr = -1.0
    if f.exist("mole_fraction_fl") and len(f.size("mole_fraction_fl")) == 2:
        vmr_fl = np.asarray(f.read("mole_fraction_fl", index=iprof),
                            np.float64)
    else:
        vmr_fl = np.full(len(pressure_hl) - 1, -1.0)
    od = np.asarray(f.read("optical_depth", index=iprof), np.float64)
    f.close()
    return Spectrum(pressure_hl, temperature_hl, wavenumber, d_wavenumber,
                    od, molecule, ref_vmr, vmr_fl, ncol)


def read_merged_spectrum(config: Config, iprofile: int,
                         prefix: str = "") -> Spectrum:
    """Read and sum the spectra of several gases.

    Config keys (relative to ``prefix``, e.g. "h2o."): ``input`` (list of
    files), ``scaling``/``conc`` (per-file scalars), ``conc_input`` +
    ``iprofile`` (target concentration profiles).  Ref
    read_merged_spectrum.cpp:19-190.
    """
    input_name = prefix + "input"
    scaling_name = prefix + "scaling"
    conc_name = prefix + "conc"
    conc_input_name = prefix + "conc_input"
    iprof_conc_name = prefix + "iprofile"

    files = config.read_strings(input_name, default=None)
    if not files:
        raise ValueError(f"Unable to read input file names in {input_name}")
    scalings = config.read_floats(scaling_name, default=None) or []
    concs = config.read_floats(conc_name, default=None) or []

    iprof_conc = -1
    conc_file = None
    pressure_conc = None
    conc_file_name = config.read_string(conc_input_name, default=None)
    if conc_file_name:
        iprof_conc = config.read_int(iprof_conc_name, default=None)
        if iprof_conc is None:
            raise ValueError('Concentration file specified without profile '
                             'number in "iprofile"')
        conc_file = NcFile(conc_file_name)
        pressure_conc = np.asarray(
            conc_file.read("pressure_fl", index=iprof_conc), np.float64)

    merged: Optional[Spectrum] = None
    molecules: List[str] = []
    vmr_rows: List[np.ndarray] = []
    pressure_fl = None

    for ibg, file_name in enumerate(files):
        scaling = scalings[ibg] if ibg < len(scalings) else -1.0
        conc = concs[ibg] if ibg < len(concs) else -1.0
        logs.log(f"  Reading {file_name}")
        sp = read_spectrum(file_name, iprofile)
        molecule = sp.molecule
        if not molecule:
            raise ValueError(
                'Found neither "constituent_id" nor "molecules" amongst the '
                "global attributes")
        molecules.append(molecule)

        if merged is None:
            merged = Spectrum(sp.pressure_hl, sp.temperature_hl,
                              sp.wavenumber, sp.d_wavenumber,
                              np.zeros_like(sp.optical_depth),
                              ncol=sp.ncol)
            pressure_fl = 0.5 * (sp.pressure_hl[:-1] + sp.pressure_hl[1:])

        conc_interp = None
        scaling_profile = None
        if iprof_conc >= 0:
            conc_req = np.asarray(conc_file.read(
                f"{molecule}_mole_fraction_fl", index=iprof_conc), np.float64)
            conc_interp = np.interp(pressure_fl, pressure_conc, conc_req)
            scaling_profile = conc_interp / sp.vmr_fl
            logs.log("    Scaling to target concentration profile in the "
                     f"range {conc_interp.min():g} to {conc_interp.max():g}")
        elif conc == 0.0:
            scaling = 0.0
        elif conc > 0.0:
            if sp.reference_surface_vmr < 0.0:
                raise ValueError(
                    "Attempt to specify concentration when no "
                    f"reference_surface_mole_fraction present in {file_name}")
            scaling = conc / sp.reference_surface_vmr
            logs.log(f"    Reference surface concentration = "
                     f"{sp.reference_surface_vmr}")
            logs.log(f"    Target surface concentration    = {conc}")
        elif scaling < 0.0:
            scaling = 1.0

        if scaling_profile is not None:
            merged.optical_depth += sp.optical_depth * scaling_profile[:, None]
            vmr_rows.append(conc_interp)
        elif scaling != 1.0:
            logs.log(f"    Scaling by {scaling}")
            merged.optical_depth += sp.optical_depth * scaling
            vmr_rows.append(sp.vmr_fl * scaling)
        else:
            merged.optical_depth += sp.optical_depth
            vmr_rows.append(sp.vmr_fl)

    if conc_file is not None:
        conc_file.close()

    merged.molecule = " ".join(molecules)
    merged.vmr_fl = np.vstack(vmr_rows)
    col_od = merged.optical_depth.sum(axis=1)
    logs.log(f"    Column optical depth: {col_od.mean():g} +/- "
             f"{col_od.std():g}")
    return merged
