from .fcn import FCN  # noqa: F401
from .resnet import ResNet18Features  # noqa: F401
