from .tip import tip_stream, windowed_block_rollup

__all__ = ["tip_stream", "windowed_block_rollup"]
