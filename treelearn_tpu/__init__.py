"""treelearn_tpu: TPU-native forest point-cloud instance segmentation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
ecker-lab/TreeLearn (see SURVEY.md): sparse submanifold 3D U-Net for per-point
semantic + offset prediction, offset-shifted clustering into tree instances,
tiled whole-plot inference with ensembling and label propagation, training,
and the benchmark evaluation protocol.
"""

__version__ = "0.1.0"

from .config import ConfigDict, config_to_dict, get_args_and_cfg, get_config  # noqa: F401
