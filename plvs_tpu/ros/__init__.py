"""Optional ROS 2 bindings (reference: Examples/ROS2/PLVS rclcpp nodes +
Examples_old/ROS ROS1 nodes). Conversions and topic-sync bridges are
ROS-free and always importable; the rclpy node mains require a ROS 2
environment."""

from . import conversions  # noqa: F401
from .nodes import (  # noqa: F401
    ApproxTimeSync,
    MonoSlamBridge,
    RgbdSlamBridge,
    StereoSlamBridge,
)
