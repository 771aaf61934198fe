"""``python -m photorealistic_rendering_using_opencl_tpu`` entry point."""
import sys

from photorealistic_rendering_using_opencl_tpu.runtime.app import main

sys.exit(main())
