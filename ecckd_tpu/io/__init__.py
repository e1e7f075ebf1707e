from .ncio import NcFile, NcWriter, write_standard_attributes
from .spectrum import Spectrum, read_spectrum, read_merged_spectrum
from .order import SpectralOrder, read_order, write_order
