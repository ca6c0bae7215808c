"""Alias package: `vo_single_camera_sos_tpu` re-exports the `sosvo` framework.

The canonical package name in this repo is `sosvo` (see SURVEY.md layer map);
this alias keeps the conventional `<reference>_tpu` import path working.
"""

from sosvo import *  # noqa: F401,F403
import sosvo as _sosvo

__version__ = _sosvo.__version__
