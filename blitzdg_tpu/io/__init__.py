from . import csv, vtk
from .checkpoint import restore_checkpoint, save_checkpoint
from .vtk import write_fields_to_files, write_vtu

__all__ = [
    "csv",
    "vtk",
    "write_vtu",
    "write_fields_to_files",
    "save_checkpoint",
    "restore_checkpoint",
]
