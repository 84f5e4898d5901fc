"""Native (C++) runtime components: transition datastore + MPPI core.

Built with ``make -C mppi_tf_tpu/native``; each binding degrades gracefully
(ImportError) when the toolchain is unavailable.
"""
