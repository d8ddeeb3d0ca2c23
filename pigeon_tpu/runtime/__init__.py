from pigeon_tpu.runtime import loop, transport
from pigeon_tpu.runtime.loop import (ControllerRuntime, FromAutobox,
                                     ToAutobox)
