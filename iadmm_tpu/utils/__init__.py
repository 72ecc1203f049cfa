from .timing import Timer, block_tree

__all__ = ["Timer", "block_tree"]
