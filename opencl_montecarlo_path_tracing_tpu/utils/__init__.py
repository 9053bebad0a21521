from .pam import ImgInfo, save_pam, load_pam
from .profiling import StageTimer

__all__ = ["ImgInfo", "save_pam", "load_pam", "StageTimer"]
