"""Persistent rendering service.

The reference ships only offline batch renderers (render_monocular_bt.py);
production deployment wants a resident process that loads the checkpoint
once, keeps per-frame feature maps warm on device, and streams rendered
views out.  :mod:`session` holds the device state; :mod:`server` exposes it
over HTTP.
"""

from dynibar_tpu.serve.session import RenderSession  # noqa: F401
