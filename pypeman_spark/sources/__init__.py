from .cron import cron_match_col, cron_ticks, rate_stream  # noqa: F401
from .dirwatch_datasource import DirWatchDataSource  # noqa: F401
from .file_watcher import FileWatcher, scan_files, stream_files  # noqa: F401
from .ftp import FTPConnection, FTPWatcher, ftp_read_file, ftp_write_file  # noqa: F401
from .http_sidecar import HttpLandingServer, hl7_ack_for_state  # noqa: F401
from .merge import merge_channels  # noqa: F401
from .mllp_sidecar import MllpLandingServer  # noqa: F401
from .tables import TABLES, load_table, load_tables, register_views  # noqa: F401
