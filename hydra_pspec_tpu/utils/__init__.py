"""IO, configuration, and provenance utilities (the reference's data plane:
hydra_pspec/utils.py + the driver's file handling in run-hydra-pspec.py)."""

from . import io, uvh5, config, provenance
from .uvh5 import filter_freqs, trim_flagged_channels
from .io import write_numpy_files, add_mtime_to_filepath
