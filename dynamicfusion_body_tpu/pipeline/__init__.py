from .fusion import Fusion, FusionDM, FusionDM_GPU
