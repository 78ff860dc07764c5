from mfx.oracle.java_oracle import (
    OracleState, init_oracle, train_epoch_sequential, oracle_rmse,
)

__all__ = ["OracleState", "init_oracle", "train_epoch_sequential", "oracle_rmse"]
