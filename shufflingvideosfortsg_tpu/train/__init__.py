from .state import TrainState, create_train_state, make_optimizer  # noqa: F401
