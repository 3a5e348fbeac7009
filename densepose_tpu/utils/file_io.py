"""Path resolution + cached downloads.

Equivalent surface of the reference's PathManager setup
(/root/reference/detectron2/utils/file_io.py): resolves the
``detectron2://`` scheme to ``https://dl.fbaipublicfiles.com/detectron2/``,
rewrites OneDrive share links to their direct-download API form (iopath's
``OneDrivePathHandler`` semantics), and caches http(s) downloads locally.
In zero-egress environments the download raises a clear error instead of
hanging.
"""

from __future__ import annotations

import base64
import hashlib
import logging
import os
import urllib.request

logger = logging.getLogger(__name__)

DETECTRON2_PREFIX = "detectron2://"
DETECTRON2_URL = "https://dl.fbaipublicfiles.com/detectron2/"
ONEDRIVE_PREFIX = "https://1drv.ms/"


def onedrive_download_url(share_link: str) -> str:
    """OneDrive share link -> direct-download URL (the encoding iopath's
    OneDrivePathHandler uses: base64url of the link, 'u!' prefix, padding
    stripped)."""
    b64 = base64.urlsafe_b64encode(share_link.encode()).decode().rstrip("=")
    return f"https://api.onedrive.com/v1.0/shares/u!{b64}/root/content"
CACHE_DIR = os.path.expanduser(os.environ.get("DENSEPOSE_TPU_CACHE",
                                              "~/.cache/densepose_tpu"))


def get_local_path(path: str, timeout: int = 60) -> str:
    """Local path passthrough; detectron2:// and http(s):// resolve into the
    cache directory (downloading on first use)."""
    if path.startswith(DETECTRON2_PREFIX):
        path = DETECTRON2_URL + path[len(DETECTRON2_PREFIX):]
    if path.startswith(ONEDRIVE_PREFIX):
        path = onedrive_download_url(path)
    if path.startswith(("http://", "https://")):
        os.makedirs(CACHE_DIR, exist_ok=True)
        digest = hashlib.sha1(path.encode()).hexdigest()[:16]
        fname = os.path.basename(path.split("?")[0]) or "download"
        local = os.path.join(CACHE_DIR, f"{digest}_{fname}")
        if os.environ.get("DENSEPOSE_TPU_OFFLINE") and not os.path.exists(local):
            raise IOError(f"DENSEPOSE_TPU_OFFLINE set and {path!r} not cached "
                          f"at {local!r}")
        if not os.path.exists(local):
            logger.info("downloading %s -> %s", path, local)
            tmp = local + ".tmp"
            try:
                urllib.request.urlretrieve(path, tmp)
            except Exception as e:
                raise IOError(
                    f"could not download {path!r} (no network egress?); "
                    f"place the file at {local!r} manually") from e
            os.replace(tmp, local)
        return local
    return path
