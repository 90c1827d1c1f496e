from .rectified_flow import make_train_step, prepare_batch_tensors, rf_loss  # noqa: F401
