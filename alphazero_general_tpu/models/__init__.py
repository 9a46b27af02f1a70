from alphazero_general_tpu.models.architectures import (  # noqa: F401
    FullyConnected,
    ResNet,
    build_model,
)
from alphazero_general_tpu.models.wrapper import (  # noqa: F401
    NetState,
    NNetWrapper,
    multistep_lr,
)
