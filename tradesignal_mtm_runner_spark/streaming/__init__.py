"""streaming subpackage."""

def await_or_raise(query, timeout_sec: int = 300) -> None:
    """awaitTermination with the boolean CHECKED: on timeout the
    memory sink holds a plausible-looking PARTIAL result, so the query
    is stopped and a TimeoutError raised instead of returning it
    (ADVICE r5). All availableNow replays in this repo finish in
    seconds at test SF — a timeout means something hung."""
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise TimeoutError(
            f"streaming query did not finish within {timeout_sec}s; "
            "partial sink contents discarded"
        )
