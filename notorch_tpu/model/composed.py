"""Declarative key-space model composition.

The reference's centerpiece is a model declared as named modules that
read/write keys of a TensorDict (``notorch/lightning_models/model.py:145-219``
via ``TensorDictModule``/``TensorDictSequential``). The JAX analog: a flat
dict-of-arrays "batch" pytree, and a :class:`ComposedNetwork` (flax linen)
that runs named submodules in order, fetching ``in_keys`` and storing results
under ``<name>.<out_key>``. The whole DAG traces into ONE jitted/pjit-ted
function; XLA's dead-code elimination plays the role of the reference's
``selected_out_keys`` output pruning.

Key conventions (reference ``notorch/conf.py``): inputs arrive under
``inputs.*``, targets under ``targets.*``; module outputs land under
``<module name>.*``.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import flax.linen as nn

__all__ = ["ComposedNetwork", "ModuleSpec", "LossSpec", "get_key"]


def get_key(batch: Mapping[str, Any], key: str):
    try:
        return batch[key]
    except KeyError:
        raise KeyError(f"key {key!r} not in batch; available: {sorted(batch)}") from None


class ModuleSpec(dict):
    """``{"module": nn.Module, "in_keys": [...] | {...}, "out_keys": [...]}`` —
    mirrors the reference's ``ModuleConfig`` (types.py:45-50)."""

    def __init__(self, module, in_keys, out_keys):
        super().__init__(module=module, in_keys=in_keys, out_keys=out_keys)


class LossSpec(dict):
    """``{"fn": callable, "in_keys": [...] | {...}, "weight": float}`` —
    mirrors the reference's ``LossConfig`` (types.py:52-55)."""

    def __init__(self, fn, in_keys, weight: float = 1.0):
        super().__init__(fn=fn, in_keys=in_keys, weight=weight)


def _gather(batch: Mapping[str, Any], in_keys):
    if isinstance(in_keys, Mapping):
        return (), {kw: get_key(batch, k) for kw, k in in_keys.items()}
    return tuple(get_key(batch, k) for k in in_keys), {}


class ComposedNetwork(nn.Module):
    """Run named modules in declaration order over the batch dict.

    ``modules``: mapping name -> linen module. ``wiring``: mapping name ->
    (in_keys, out_keys); in_keys may be a sequence (positional) or mapping
    (keyword). Module outputs (single value or tuple) are stored under
    ``<name>.<out_key>``.
    """

    modules_: dict[str, nn.Module]
    wiring: tuple  # tuple of (name, in_keys, out_keys) — hashable static config

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        batch = dict(batch)
        for name, in_keys, out_keys in self.wiring:
            module = self.modules_[name]
            args, kwargs = _gather(batch, in_keys)
            out = module(*args, training=training, **kwargs)
            if not isinstance(out, tuple):
                out = (out,)
            if len(out) != len(out_keys):
                raise ValueError(
                    f"module {name!r} returned {len(out)} values for "
                    f"{len(out_keys)} out_keys {list(out_keys)}"
                )
            for key, value in zip(out_keys, out):
                batch[f"{name}.{key}"] = value
        return batch


def _toposort(modules: Mapping[str, Mapping[str, Any]]) -> list[str]:
    """Order modules by their key-space dependencies (module X consumes
    ``Y.<key>`` => Y runs first), keeping declaration order among
    independents. Declaration order alone is fragile — YAML tooling
    (``yaml.safe_dump`` sorts keys) and JSON round-trips can permute the
    mapping, and the wiring already names the true DAG."""
    names = list(modules)
    deps: dict[str, set[str]] = {}
    for name, cfg in modules.items():
        in_keys = cfg["in_keys"]
        keys = in_keys.values() if isinstance(in_keys, Mapping) else in_keys
        deps[name] = {
            k.split(".", 1)[0]
            for k in keys
            if "." in k and k.split(".", 1)[0] in modules
        }
    order: list[str] = []
    done: set[str] = set()
    while len(order) < len(names):
        progressed = False
        for name in names:
            if name not in done and deps[name] <= done:
                order.append(name)
                done.add(name)
                progressed = True
        if not progressed:
            cyc = sorted(set(names) - done)
            raise ValueError(f"module wiring has a dependency cycle among {cyc}")
    return order


def make_network(modules: Mapping[str, Mapping[str, Any]]) -> ComposedNetwork:
    """Build a :class:`ComposedNetwork` from reference-style module configs:
    ``{name: {"module": m, "in_keys": [...], "out_keys": [...]}}``.
    Execution order is the topological order of the key-space DAG, so the
    mapping's declaration order never has to match the dataflow."""
    modules = {name: modules[name] for name in _toposort(modules)}
    mods = {name: cfg["module"] for name, cfg in modules.items()}
    wiring = tuple(
        (
            name,
            (
                tuple(cfg["in_keys"])
                if isinstance(cfg["in_keys"], Sequence) and not isinstance(cfg["in_keys"], str)
                else _freeze_mapping(cfg["in_keys"])
            ),
            tuple(cfg["out_keys"]),
        )
        for name, cfg in modules.items()
    )
    return ComposedNetwork(modules_=mods, wiring=wiring)


class _freeze_mapping(dict):
    """Hashable mapping so wiring stays a valid static linen field."""

    def __hash__(self):  # noqa: D105
        return hash(tuple(sorted(self.items())))
