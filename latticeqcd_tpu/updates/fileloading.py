"""Load-and-measure updater: each "update" loads the next stored config.

Counterpart of GivenConfigurations (SURVEY.md 2.2;
/root/reference/src/updates/givenconfigurations.jl:7-63): scan
loadU_dir for files of the given format, optionally filtered by a
list file (loadU_fromfile/loadU_filename, legacy list support
mainrun.jl:229-273); the driver sets Nsteps to the file count.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp

from latticeqcd_tpu.io import load_bridge_text, load_u
from latticeqcd_tpu.io.ildg import ILDG
from latticeqcd_tpu.io.jld2 import load_jld2

_EXT = {"JLD": (".jld2", ".npz"), "NPZ": (".npz",), "ILDG": (".ildg",), "BridgeText": (".txt",)}


@dataclass
class GivenConfigurations:
    loadU_format: str
    loadU_dir: str
    lattice: tuple
    nc: int
    filelist: List[str] = field(default_factory=list)
    current: int = 0
    _ildg_handles: dict = field(default_factory=dict, repr=False)

    def _ildg(self, fn):
        """One header scan per file, reused across updates (a multi-config
        production file can be GBs; ILDG() seeks over payloads but the
        header walk still shouldn't repeat every trajectory)."""
        h = self._ildg_handles.get(fn)
        if h is None:
            h = self._ildg_handles[fn] = ILDG(fn)
        return h

    @classmethod
    def from_params(cls, p, lattice, nc):
        fmt = p.loadU_format
        if fmt not in _EXT:
            raise ValueError(f"loadU_format should be JLD/NPZ, ILDG or BridgeText, got {fmt!r}")
        if p.loadU_fromfile:
            with open(os.path.join(p.loadU_dir, p.loadU_filename)) as fp:
                names = [l.split()[0] for l in fp if l.strip() and not l.startswith("#")]
            files = [os.path.join(p.loadU_dir, n) for n in names]
        else:
            files = sorted(
                os.path.join(p.loadU_dir, f)
                for f in os.listdir(p.loadU_dir)
                if f.endswith(_EXT[fmt])
            )
        if not files:
            raise FileNotFoundError(f"no {fmt} configurations in {p.loadU_dir!r}")
        self = cls(fmt, p.loadU_dir, tuple(lattice), nc)
        if fmt == "ILDG":
            # expand multi-config LIME files into one entry per record,
            # keeping the scanned handles for the load phase
            expanded = []
            for f in files:
                n = len(self._ildg(f))
                expanded.extend([(f, i + 1) for i in range(n)] if n > 1 else [f])
            files = expanded
        self.filelist = files
        return self

    @property
    def nsteps(self) -> int:
        return len(self.filelist)

    def _load(self, filename, dtype):
        if self.loadU_format in ("JLD", "NPZ"):
            if str(filename).endswith((".jld2", ".jld")):
                return load_jld2(filename, self.lattice, self.nc, dtype=dtype)
            return load_u(filename, dtype=dtype)
        if self.loadU_format == "ILDG":
            # each entry may be (file, index) for multi-config LIME files
            fn, idx = filename if isinstance(filename, tuple) else (filename, 1)
            return self._ildg(fn).load(idx, self.lattice, self.nc, dtype=dtype)
        return load_bridge_text(filename, self.lattice, self.nc, dtype=dtype)

    def update(self, u, key):
        """Load the next config; always 'accepted'."""
        fn = self.filelist[self.current]
        self.current += 1
        return self._load(fn, u.dtype), key, True
