from .ncio import NcFile, NcWriter, write_standard_attributes
