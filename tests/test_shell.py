"""O10 executor: stdout error-line scan + stderr-preferring failure
messages (ref: rustic-shell/src/shell_command_executor.rs:47-107)."""

from __future__ import annotations

import pytest

from rustic_witcher_spark.shell import ShellCommandError, execute_cmd


def test_clean_rc0_passes():
    execute_cmd("echo restoring collection a; echo done", check_for_error=True)


def test_rc0_with_error_line_fails():
    # the load-bearing case: partial pg_restore/mongorestore failures
    # print "error" lines but still exit 0
    with pytest.raises(ShellCommandError, match="ERROR: relation exists"):
        execute_cmd(
            "echo starting; echo 'ERROR: relation exists'; echo after",
            check_for_error=True,
        )


def test_scan_is_case_insensitive():
    with pytest.raises(ShellCommandError, match="an Error happened"):
        execute_cmd("echo 'an Error happened'", check_for_error=True)


def test_scan_off_by_default():
    # without the flag, an "error" stdout line at rc==0 is NOT a failure
    execute_cmd("echo 'ERROR: relation exists'")


def test_scan_only_watches_stdout():
    # stderr "error" chatter at rc==0 passes even with the flag (the
    # reference only returns Err on STDOUT matches; stderr lines are
    # collected for the nonzero-exit message)
    execute_cmd("echo 'error: noise' >&2; echo ok", check_for_error=True)


def test_nonzero_exit_prefers_stderr_error_lines():
    with pytest.raises(ShellCommandError) as ei:
        execute_cmd("echo 'loading...' >&2; echo 'ERROR: bad dump' >&2; exit 3")
    assert str(ei.value) == "ERROR: bad dump"


def test_nonzero_exit_falls_back_to_all_stderr_then_status():
    with pytest.raises(ShellCommandError, match="something odd"):
        execute_cmd("echo 'something odd' >&2; exit 1")
    with pytest.raises(ShellCommandError, match="exited with status 2"):
        execute_cmd("exit 2")


def test_argv_form():
    execute_cmd(["echo", "hello"], check_for_error=True)
    with pytest.raises(ShellCommandError):
        execute_cmd(["cat", "/nonexistent-file-xyz"])


def test_early_kill_on_long_stream():
    # the scan must fail fast, not wait for the child to finish
    with pytest.raises(ShellCommandError, match="error at line 1"):
        execute_cmd(
            "echo 'error at line 1'; sleep 30; echo done",
            check_for_error=True,
        )
