from .graph import TokenGraph, prune_low_liquidity

__all__ = ["TokenGraph", "prune_low_liquidity"]
