from .train_step import TrainState, make_train_step, asr_loss

__all__ = ["TrainState", "make_train_step", "asr_loss"]
