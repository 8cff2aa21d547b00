"""Compat alias: reference helicon.lib.dataset -> helicon_tpu.io.dataset.

A true sys.modules alias (not a re-export shim): reference tests patch
network fetchers BY MODULE PATH — e.g.
``patch("helicon.lib.dataset.get_emd_entries")`` (reference
tests/test_dataset.py) — which setattr's on THIS module object. Only if
this module IS helicon_tpu.io.dataset does the patch intercept the
name EMDB.update_emd_entries resolves at call time.
"""

import sys

from helicon_tpu.io import dataset as _impl

sys.modules[__name__] = _impl
