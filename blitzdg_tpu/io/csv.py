"""Whitespace-delimited field writer (reference CsvOutputter analog,
src/CsvOutputter.cpp: filenames field%07d.dat, space-delimited values)."""
from __future__ import annotations

import os

import numpy as np


def generate_file_name(base: str, index: int) -> str:
    return f"{base}{index:07d}.dat"


def write_field(path: str, field, delimiter: str = " ") -> None:
    np.savetxt(path, np.asarray(field), delimiter=delimiter, fmt="%.17g")


def read_field(path: str) -> np.ndarray:
    return np.loadtxt(path)


def write_fields_to_files(fields: dict, index: int, out_dir: str = ".") -> list[str]:
    paths = []
    for name, data in fields.items():
        p = os.path.join(out_dir, generate_file_name(name, index))
        write_field(p, data)
        paths.append(p)
    return paths
