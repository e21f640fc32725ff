"""Multi-chip scaling: device meshes, shardings, sharded train/infer steps.

The reference has no model parallelism (single-device batch-1 inference per
stream; SURVEY.md §2.15). This package provides the TPU-native scaling story:

  * ``mesh``  — mesh construction + parameter/batch NamedShardings
  * ``train`` — a full detection train step (loss + optax update) pjit'd over
    (dp, tp): batch sharded over dp, conv output channels over tp; XLA
    inserts the all-reduces over ICI.

CNN detection has two useful parallel axes — batch (dp) and channels (tp);
pipeline (pp) and expert (ep) parallelism do not apply to these models (no
layer pipeline at this scale, no MoE), and sequence parallelism appears as
time-axis sharding for clip models.
"""

from .mesh import batch_sharding, make_mesh, param_shardings, replicated  # noqa: F401
from .train import detection_loss, make_train_step, synthetic_targets  # noqa: F401
