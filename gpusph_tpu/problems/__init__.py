"""problems subpackage."""
