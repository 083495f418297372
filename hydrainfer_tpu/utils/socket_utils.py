"""Host/port auto-resolution (reference: hydrainfer/utils/socket_utils.py:14-86)."""
import socket
from typing import Optional


def find_free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def get_host() -> str:
    """Best-effort non-loopback host address."""
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.connect(("8.8.8.8", 80))
        host = s.getsockname()[0]
        s.close()
        return host
    except OSError:
        return "127.0.0.1"


def parse_address(host: Optional[str] = None, port: Optional[int] = None,
                  scheme: str = "tcp") -> str:
    """'auto' sentinel resolution → scheme://host:port."""
    if host in (None, "auto"):
        host = get_host()
    if port in (None, -1, "auto"):
        port = find_free_port()
    return f"{scheme}://{host}:{port}"
