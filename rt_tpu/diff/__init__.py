from rt_tpu.diff.inverse import (  # noqa: F401
    PARAM_FIELDS,
    apply_params,
    extract_params,
    make_loss_fn,
    make_train_step,
    fit,
)
