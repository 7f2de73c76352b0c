"""Small Ray helpers shared by queries and ops.

`task_callable` wraps a stateful callable CLASS for task-based
`map_batches`: construction (broadcast `ray.get`, regex compiles,
coefficient setup) happens once per WORKER via a module-level cache —
the same state amortization as an actor pool, without its slow ramp-up
(measured on this Ray version: an actor pool adds ~1 s before reaching
width; stateless tasks schedule at full width immediately).
"""

from __future__ import annotations

_CACHE: dict = {}


def task_callable(cls, *, cache_key=None, **ctor_kwargs):
    """A plain function for map_batches that lazily builds `cls(**ctor)`
    once per worker process and reuses it across batches.

    The cache holds ONE live instance per worker (cleared on key
    change), so long-lived workers never accumulate stale state across
    queries. ObjectRef kwargs are fine — their repr (which embeds the
    object id) is part of the default cache key, and the instance's
    `__init__` resolves them from the local plasma store once.
    """
    if cache_key is None:
        cache_key = (
            cls.__module__,
            cls.__qualname__,
            tuple(sorted((k, repr(v)) for k, v in ctor_kwargs.items())),
        )

    def fn(batch):
        inst = _CACHE.get(cache_key)
        if inst is None:
            # bounded cache, NOT single-slot: two task_callable stages
            # of one pipeline interleaving in a worker would otherwise
            # evict each other every batch and re-run construction
            # (broadcast ray.get, regex compiles) per call
            if len(_CACHE) >= 8:
                _CACHE.clear()
            inst = cls(**ctor_kwargs)
            _CACHE[cache_key] = inst
        return inst(batch)

    return fn
