# import regex library
import re

# state file generated for paraview version 5.12
import paraview
paraview.compatibility.major = 5
paraview.compatibility.minor = 12

# Directory containing the .vtkhdf files
directory = 'out/db3_long'

import os
regex = r'DamBreak3D.vtkhdf'
file_list = [os.path.join(directory, f) for f in os.listdir(directory) if re.search(regex, f)]

from paraview.simple import *
paraview.simple._DisableFirstRenderCameraReset()

materialLibrary1 = GetMaterialLibrary()
renderView1 = CreateView('RenderView')
renderView1.AxesGrid.Visibility = 1
renderView1.InteractionMode = '3D'
SetActiveView(None)

layout1 = CreateLayout(name='Layout #1')
layout1.AssignView(0, renderView1)
SetActiveView(renderView1)

Simulation_vtkhdf = VTKHDFReader(registrationName='DamBreak3D.vtkhdf*', FileName=file_list)
Simulation_vtkhdf.PointArrayStatus = ['ChunkID', 'Kernel', 'KernelGradient', 'Density', 'Pressure', 'Velocity', 'Acceleration', 'BoundaryBool', 'ID', 'Type', 'GroupMarker', 'GhostPoints', 'GhostNormals']

Simulation_vtkhdfDisplay = Show(Simulation_vtkhdf, renderView1, 'GeometryRepresentation')
Simulation_vtkhdfDisplay.SetRepresentationType('Point Gaussian')
Simulation_vtkhdfDisplay.Position = [0.0, 0.0, 0.0]
ColorBy(Simulation_vtkhdfDisplay, ('POINTS', 'Density'))
Simulation_vtkhdfDisplay.RescaleTransferFunctionToDataRange(True, False)
Simulation_vtkhdfDisplay.SetScalarBarVisibility(renderView1, True)
renderView1.ResetCamera()
Render()
