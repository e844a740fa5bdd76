"""Exception hierarchy (parity: pii-data helper/exception usage in reference)."""


class PiiBaseException(Exception):
    """Base exception; supports lazy `{}`-style formatting like the reference."""

    def __init__(self, msg: str = "", *args):
        if args:
            msg = msg.format(*args)
        super().__init__(msg)


class InvArgException(PiiBaseException):
    """Invalid argument (reference helper/context.py raises)."""


class BuildException(PiiBaseException):
    """Cannot build a task (reference build/task/regex.py:36-38)."""


class InvPiiTask(PiiBaseException):
    """Invalid task descriptor (reference gather/parser/utils.py)."""


class ProcException(PiiBaseException):
    """Processing error (reference api/processor.py)."""


class PiiUnimplemented(PiiBaseException):
    """Missing implementation (reference build/task/base.py:199)."""
