"""Phase timing, mirroring the reference's Timer
(/root/reference/src/fastqdedup/__init__.py:42-51)."""

import datetime
import time


class Timer:
    """Returns the (rounded) timedelta since the previous call and resets."""

    def __init__(self):
        self.start_time = time.time()

    def get_difference(self) -> datetime.timedelta:
        current_time = time.time()
        delta = datetime.timedelta(
            seconds=round(current_time - self.start_time))
        self.start_time = current_time
        return delta
