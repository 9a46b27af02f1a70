from alphazero_general_tpu.train.coach import Coach, TrainState  # noqa: F401
