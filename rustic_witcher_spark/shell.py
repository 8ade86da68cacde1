"""Shell command executor with error-line scanning (O10, SURVEY §2).

Reference parity: rustic-shell/src/shell_command_executor.rs:10-107.
The reference streams the child's stdout and stderr line-by-line;
with ``check_for_error`` set, ANY stdout line containing "error"
(case-insensitive) fails the command immediately — even when the
process would later exit 0. That semantic is load-bearing for
``mongorestore`` (the one reference call site passing ``Some(true)``,
mongo_data_importer.rs:194), which reports per-collection failures on
stdout and still exits 0 after a partial restore.

On a nonzero exit the raised message prefers the stderr lines
containing "error"/"warning", then all stderr, then the bare exit
status — the same precedence as shell_command_executor.rs:85-103.

Commands are either an argv list (executed directly — the form
``PgSyncHooks.run_command`` and the mongo_buddy hooks pass) or a
string (run via ``sh -c``, the reference's form).
"""

from __future__ import annotations

import subprocess
import threading


class ShellCommandError(RuntimeError):
    """A command failed: error line seen on stdout, or nonzero exit."""


def execute_cmd(cmd: str | list[str], check_for_error: bool = False) -> None:
    """Run ``cmd``, streaming output; raise ``ShellCommandError`` on
    failure. With ``check_for_error``, the first stdout line containing
    "error" (case-insensitive) kills the child and raises with that
    line, regardless of what the exit status would have been."""
    argv = ["sh", "-c", cmd] if isinstance(cmd, str) else list(cmd)
    # start_new_session: the error-line kill must take down the WHOLE
    # process tree. kill()ing just the sh wrapper orphans its children,
    # and an orphan holding the inherited stderr fd kept the drain
    # thread (and so the raise) blocked until the orphan exited — the
    # "fail fast" contract waited out the very command it had killed.
    proc = subprocess.Popen(
        argv, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        start_new_session=True,
    )
    stderr_lines: list[str] = []
    stderr_error_lines: list[str] = []

    def drain_stderr() -> None:
        assert proc.stderr is not None
        for raw in proc.stderr:
            line = raw.rstrip("\n")
            low = line.lower()
            if "error" in low or "warning" in low:
                stderr_error_lines.append(line)
            stderr_lines.append(line)

    # stderr drains on its own thread so a chatty child can never
    # deadlock against a full pipe while we scan stdout
    drainer = threading.Thread(target=drain_stderr, daemon=True)
    drainer.start()

    assert proc.stdout is not None
    error_line: str | None = None
    for raw in proc.stdout:
        line = raw.rstrip("\n")
        if check_for_error and "error" in line.lower():
            error_line = line
            break
    if error_line is not None:
        import os
        import signal

        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()  # group already gone (or unkillable): kill the leader
        proc.wait()
        drainer.join()
        raise ShellCommandError(error_line)

    rc = proc.wait()
    drainer.join()
    if rc != 0:
        msg = (
            "\n".join(stderr_error_lines)
            or "\n".join(stderr_lines)
            or f"command exited with status {rc}"
        )
        raise ShellCommandError(msg)
