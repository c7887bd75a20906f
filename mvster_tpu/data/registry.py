"""String-keyed dataset registry.

Replaces the reference's importlib-based `find_dataset_def`
(/root/reference/datasets/__init__.py:5-8) with an explicit decorator registry
(import side effects are in mvster_tpu.data.__init__).  Reference dataset
names are aliased so existing configs keep working.
"""

from __future__ import annotations

_REGISTRY: dict[str, type] = {}


def register_dataset(*names):
    def deco(cls):
        for name in names:
            _REGISTRY[name] = cls
        return cls
    return deco


def find_dataset_def(name: str):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown dataset {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None
