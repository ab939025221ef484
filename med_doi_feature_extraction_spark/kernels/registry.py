"""Kernel registry: name → (callable, version).

Mirrors the reference's declarative extensibility (pluggable provider
ABC at reference ``src/providers/base.py:26-51`` and the name→callable
command registry at ``src/cli/registry.py:1-18``): pipeline configs
reference kernels by name; the engine resolves them here and stamps
``kernel_version`` into the lineage manifest so outputs are traceable
to the exact kernel code that produced them.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass


@dataclass(frozen=True)
class Kernel:
    name: str
    version: str
    fn: Callable

    @property
    def versioned_name(self) -> str:
        return f"{self.name}/{self.version}"


KERNELS: dict[str, Kernel] = {}


def register_kernel(name: str, version: str) -> Callable[[Callable], Callable]:
    def deco(fn: Callable) -> Callable:
        KERNELS[name] = Kernel(name=name, version=version, fn=fn)
        return fn

    return deco


def get_kernel(name: str) -> Kernel:
    try:
        return KERNELS[name]
    except KeyError:
        raise KeyError(
            f"unknown kernel {name!r}; registered: {sorted(KERNELS)}"
        ) from None
