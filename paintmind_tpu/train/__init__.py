from .steps import (make_vqgan_train_step, make_pipeline_train_step,  # noqa: F401
                    init_vqgan_train_state, init_pipeline_train_state)
