from . import geoip, spur  # noqa: F401
from . import iptools  # noqa: F401
from .iptools import (  # noqa: F401
    extract_all_ips,
    extract_ips,
    extract_private_ips,
    extract_public_ips,
    ipv4_to_numeric,
    is_in,
    is_private,
    is_valid,
    numeric_to_ipv4,
    to_address,
    to_ipv4,
    to_string,
)
