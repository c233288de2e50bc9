"""Session GUC defaults (utils/misc/guc.c): the parameters
current_setting()/SHOW report out of the box; RESET ALL restores
exactly this table (split from engine.py in the r15 size pass)."""

from __future__ import annotations

# current_setting() out of the box; RESET restores these
_GUC_DEFAULTS: dict[str, str] = {
    "work_mem": "4MB",
    "maintenance_work_mem": "64MB",
    "shared_buffers": "128MB",
    "statement_timeout": "0",
    "search_path": '"$user", public',
    "server_version": "12.0",
    "standard_conforming_strings": "off",
    "datestyle": "ISO, MDY",
    "intervalstyle": "postgres",
    "bytea_output": "hex",
    "xmlbinary": "base64",
    "client_encoding": "UTF8",
    "server_encoding": "UTF8",
    "max_parallel_workers_per_gather": "2",
    # SET ROLE / current_setting('role'): single-user engine — the
    # role is never assumed (guc.c show_role renders "none")
    "role": "none",
    # engine-specific: maps to spark.sql.ansi.enabled (see _set_guc);
    # RESET/DISCARD must restore the relaxed posture, not just the text
    "strict_errors": "off",
    # FTS default config (ts_cache.c getTSCurrentConfig); the dialect's
    # to_tsvector/to_tsquery 1-arg lowering reads the module mirror in
    # dialect/fts.py, updated by the SET handler
    "default_text_search_config": "pg_catalog.english",
    # GP autostats GUCs (guc_gp.c gp_autostats_modes, default
    # GP_AUTOSTATS_NONE): accepted + reported, no-ops here — stats
    # collection is Spark/AQE's job
    "gp_autostats_mode": "none",
    "gp_autostats_mode_in_functions": "none",
}
