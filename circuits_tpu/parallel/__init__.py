"""Multi-chip sharding of the witness engine (SURVEY.md §2.4).

The tx-lane axis — made embarrassingly parallel by the circuit's im-signal
contract (src/rollup-main.circom:93-99) — is sharded over a 1-D device
mesh with jax.sharding annotations; XLA inserts the (tiny) collectives:
neighbour shifts for the rq-link windows and an all-gather of the DA bits
feeding the final SHA256.
"""

from .sharding import make_tx_mesh, make_sharded_rollup_main, tx_shardings

__all__ = ["make_tx_mesh", "make_sharded_rollup_main", "tx_shardings"]
