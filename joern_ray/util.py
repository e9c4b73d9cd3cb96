"""Small shared runtime helpers."""

from __future__ import annotations


def fixed_pool(frac: float = 0.5, cap: int = 16, floor: int = 2) -> int:
    """Fixed actor-pool size off the cluster CPU count.

    Autoscaling pools starting at 1 never ramp for minutes-long stages
    (measured, BASELINE.md round-1 notes), and pools sized at n_cpus pin
    every CPU, starving concurrent task stages (measured: the parse
    write serialized on 1 CPU).  A fixed pool at a fraction of the
    cluster with a cap is the robust middle ground.
    """
    import ray

    n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(floor, min(cap, int(n * frac)))


def resolve_pool(concurrency):
    """None -> fixed_pool(); anything else passes through (tests pass
    explicit small pools)."""
    return fixed_pool() if concurrency is None else concurrency
