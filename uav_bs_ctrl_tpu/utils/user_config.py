"""User-tunable defaults for the experiment harness (parity:
reference ``utils/user_config.py``)."""

import os.path as osp

# Where experiment outputs are saved by default: <repo_root>/data
DEFAULT_DATA_DIR = osp.join(
    osp.abspath(osp.dirname(osp.dirname(osp.dirname(__file__)))), 'data')

# Whether to automatically insert a date and time stamp into save-dir names.
FORCE_DATESTAMP = False

# Whether ExperimentGrid auto-generates shorthand key names.
DEFAULT_SHORTHAND = True

# Seconds to pause before launching a grid (0 disables).
WAIT_BEFORE_LAUNCH = 0
