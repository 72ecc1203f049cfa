from .lstm_cell import (fused_lstm_cell, make_pallas_lstm_apply, TOKEN_TILE)
from .rollout_kernel import fused_rollout
from . import sparse

__all__ = ["fused_lstm_cell", "make_pallas_lstm_apply", "TOKEN_TILE",
           "fused_rollout", "sparse"]
