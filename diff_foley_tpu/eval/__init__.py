from .align_acc import alignment_accuracy
from .spec_transform import spec_16k128_to_22k80, spec_22k80_to_16k128
