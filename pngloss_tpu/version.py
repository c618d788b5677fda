__version__ = "0.1.0"

# version of the reference tool whose behavior this framework reproduces
PNGLOSS_COMPAT_VERSION = "1.0.1"
