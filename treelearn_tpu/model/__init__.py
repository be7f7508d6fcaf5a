from .network import LOSS_MULTIPLIER_SEMANTIC, TreeLearn, default_capacities  # noqa: F401
from .checkpoint import (  # noqa: F401
    checkpoint_save,
    export_torch_state_dict,
    import_torch_state_dict,
    load_checkpoint,
    load_native_checkpoint,
    save_checkpoint,
)
