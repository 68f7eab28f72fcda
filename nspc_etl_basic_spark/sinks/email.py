"""H11: email notification sink (reference loader.py:294-469).

Out-of-band driver-side notification after a job or batch ends — a stdlib
smtplib concern, not a Spark one. Behavior parity with the reference:
enabled-flag guard (send is a successful no-op when disabled), subject
prefixed by status (✅ Completed / ⚠️ CompletedWithErrors / ❌ Failed /
📊 otherwise), HTML body with the job or batch summary fields, and a
``False``-not-raise contract on SMTP failure (a notification must never
fail the job that completed).

``transport`` is injectable for tests (anything with ``sendmail`` +
``quit``); default is ``smtplib.SMTP`` with optional STARTTLS + login.
"""

from __future__ import annotations

import html
import logging
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText
from typing import Any, Callable

logger = logging.getLogger(__name__)


class EmailNotificationManager:
    def __init__(self, config: dict, transport_factory: Callable[..., Any] | None = None):
        self.email_config = (config or {}).get("email_notifications", {})
        self.enabled = bool(self.email_config.get("enabled", False))
        self._transport_factory = transport_factory

    # ---- public API (reference send_job_completion_email, loader.py:302-318)
    def send_job_completion_email(self, job_summary: dict) -> bool:
        if not self.enabled:
            logger.info("email notifications disabled; skipping send")
            return True
        try:
            subject = self.generate_subject(job_summary)
            body = self.generate_body(job_summary)
            return self._send(subject, body)
        except Exception as exc:  # noqa: BLE001 — notification must not fail the job
            logger.error("failed to send email notification: %s", exc)
            return False

    # ---- subject by status (reference loader.py:320-332)
    def generate_subject(self, job_summary: dict) -> str:
        job_type = job_summary.get("job_type", "ETL Job")
        status = job_summary.get("status", "Unknown")
        prefix = {
            "Completed": "✅",
            "CompletedWithErrors": "⚠️",
            "Failed": "❌",
        }.get(status, "📊")
        suffix = {
            "Completed": "Completed Successfully",
            "CompletedWithErrors": "Completed with Errors",
            "Failed": "Failed",
        }.get(status, "Status Update")
        return f"{prefix} {job_type} {suffix}"

    # ---- HTML body (reference loader.py:334-429)
    def generate_body(self, job_summary: dict) -> str:
        rows = []

        def row(label: str, key: str, default: str = "N/A") -> None:
            # interpolated values (error messages, paths, table names) may
            # contain markup — escape so they can't corrupt the HTML body
            val = html.escape(str(job_summary.get(key, default)))
            rows.append(f"<tr><td><b>{label}</b></td><td>{val}</td></tr>")

        row("Status", "status")
        row("Start time", "start_time")
        row("End time", "end_time")
        row("Duration (s)", "duration_seconds", "0")
        if job_summary.get("is_batch"):
            row("Directory", "directory_path")
            row("Total files", "total_files", "0")
            row("Files processed", "files_processed", "0")
            row("Files failed", "files_failed", "0")
            row("Batch job id", "batch_job_id")
        else:
            row("Source file", "source_file")
            row("Target table", "target_table")
            row("Rows read", "rows_read", "0")
            row("Rows inserted", "rows_inserted", "0")
            row("Rows updated", "rows_updated", "0")
            row("Rows failed", "rows_failed", "0")
        if job_summary.get("error_message"):
            err = html.escape(str(job_summary["error_message"]))
            rows.append(f"<tr><td><b>Error</b></td><td>{err}</td></tr>")
        title = html.escape(str(job_summary.get("job_type", "ETL Job")))
        return (
            f"<html><body><h2>{title} Summary</h2>"
            f"<table border='1' cellpadding='4'>{''.join(rows)}</table>"
            "</body></html>"
        )

    # ---- SMTP transport (reference loader.py:431-469)
    def _send(self, subject: str, body: str) -> bool:
        cfg = self.email_config
        sender = cfg.get("sender")
        recipients = list(cfg.get("recipients", []))
        if not sender or not recipients:
            logger.error("email enabled but sender/recipients missing")
            return False

        msg = MIMEMultipart("alternative")
        msg["Subject"] = subject
        msg["From"] = sender
        msg["To"] = ", ".join(recipients)
        msg.attach(MIMEText(body, "html"))

        if self._transport_factory is not None:
            smtp = self._transport_factory()
        else:  # pragma: no cover — real SMTP not available in tests
            import smtplib

            smtp = smtplib.SMTP(
                cfg.get("smtp_server", "localhost"), int(cfg.get("smtp_port", 587))
            )
            if cfg.get("use_tls", True):
                smtp.starttls()
            if cfg.get("username"):
                smtp.login(cfg["username"], cfg.get("password", ""))
        try:
            smtp.sendmail(sender, recipients, msg.as_string())
        finally:
            try:
                smtp.quit()
            except Exception:  # noqa: BLE001
                pass
        return True
