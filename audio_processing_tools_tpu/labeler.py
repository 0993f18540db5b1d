"""Interactive ground-truth labeling UI (parity with reference ``labeler.py``).

The labeler *is* the fixture factory of the system (SURVEY §4): human labels
land in ``device_audio_rain_classification`` keyed by a sha256 uid of
(source_file, segment bounds), upserted on fire-and-forget daemon threads.

Jupyter-only pieces (ipywidgets / IPython audio) import lazily so the module
loads headless; the device-context plot renders with matplotlib.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import threading
import time
from collections import deque
from pathlib import Path
from typing import Callable, Optional

import numpy as np
import pandas as pd

from audio_processing_tools_tpu.io.mark import parse_mark_audio_file
from audio_processing_tools_tpu.io.audio import pcm_to_float, write_wav


class TestVectorLabeler:
    __test__ = False  # reference-parity name starts with "Test"; not a test

    def __init__(
        self,
        audio_df: pd.DataFrame,
        db_engine,
        db_engine_upsert=None,
        max_duration_seconds: int = 15,
        local_audio_cache: str = "./raw_audio_cache",
        out_folder: Optional[str] = None,
        normalize_audio: bool = True,
        autoplay: bool = True,
        visualize_device_context: bool = False,
        context_window_days: int = 5,
        add_ibm_data: bool = True,
        visualize_time_series_signal: bool = False,
        visualize_signal_spectrogram: bool = False,
    ):
        from ipywidgets import Output

        self.audio_df = audio_df.copy()
        if "source_file" not in self.audio_df.columns:
            raise ValueError("audio_df must contain a 'source_file' column")
        if self.audio_df["source_file"].isnull().any():
            raise ValueError("audio_df contains null values in 'source_file'")
        if not self.audio_df["source_file"].is_unique:
            raise ValueError("audio_df must have unique source_file values")
        if not self.audio_df.index.equals(pd.Index(self.audio_df["source_file"])):
            self.audio_df = self.audio_df.set_index("source_file", drop=False)

        self.db_engine = db_engine
        self.db_engine_upsert = db_engine_upsert or db_engine
        self.max_duration_seconds = max_duration_seconds
        self.local_audio_cache = local_audio_cache
        self.out_folder = (
            Path(out_folder).expanduser().resolve() if out_folder is not None else None
        )
        if self.out_folder is not None:
            self.out_folder.mkdir(parents=True, exist_ok=True)
        self.normalize_audio = normalize_audio
        self.autoplay = autoplay
        self.visualize_device_context = visualize_device_context
        self.context_window_days = context_window_days
        self.add_ibm_data = add_ibm_data
        self.visualize_time_series_signal = visualize_time_series_signal
        self.visualize_signal_spectrogram = visualize_signal_spectrogram

        self.index_list = self.audio_df.index
        self.index_iter = iter(self.index_list)
        self.main_output = Output()
        self.audio_output = Output()
        self.signal_output = Output()
        self.spectrogram_output = Output()
        self.figure_output = Output()
        self.history_stack: deque = deque()
        self.upsert_threads: list = []

    # ------------------------------------------------------------------
    def reset(self) -> None:
        from ipywidgets import Output

        self.index_list = self.audio_df.index
        self.index_iter = iter(self.index_list)
        self.history_stack = deque()
        self.main_output = Output()
        self.audio_output = Output()
        self.signal_output = Output()
        self.spectrogram_output = Output()
        self.figure_output = Output()
        self.upsert_threads = []

    def label_vectors(self) -> None:
        """Start a fresh labeling session from the first file."""
        from IPython.display import display

        self.reset()
        for w in (self.main_output, self.audio_output, self.signal_output,
                  self.spectrogram_output, self.figure_output):
            display(w)
        self.process_next_index()

    def process_next_index(self) -> None:
        from IPython.display import clear_output

        try:
            next_index = next(self.index_iter)
            self.history_stack.append(next_index)
            self.process_index(next_index, self.process_next_index, self.main_output)
        except StopIteration:
            with self.main_output:
                clear_output(wait=True)
                print("All files have been processed.")

    def process_previous_index(self) -> None:
        if len(self.history_stack) > 1:
            self.history_stack.pop()
            previous_index = self.history_stack.pop()
            self.index_iter = iter(
                self.index_list[self.index_list.get_loc(previous_index):]
            )
            self.process_index(previous_index, self.process_next_index,
                               self.main_output)
        else:
            with self.main_output:
                print("No previous file to go back to.")

    # ------------------------------------------------------------------
    @staticmethod
    def str_to_bool(s: str) -> bool:
        return str(s).lower() == "true"

    @staticmethod
    def generate_uid(data: str) -> str:
        h = hashlib.sha256()
        h.update(data.encode())
        return h.hexdigest()

    @staticmethod
    def fetch_ibm_data(db_engine, start_date, end_date, lat, long):
        """IBM weather overlay query (``labeler.py:133-146``)."""
        from audio_processing_tools_tpu.io.db import get_db_data

        q = f"""
        SELECT time_utc as time, precip as ibm_precip
        FROM ext_weather.hist_local_hourly
        WHERE time_utc BETWEEN '{start_date:%Y-%m-%d %H:%M:%S}'
              AND '{end_date:%Y-%m-%d %H:%M:%S}'
          AND lat BETWEEN {lat} - 0.005 AND {lat} + 0.005
          AND long BETWEEN {long} - 0.005 AND {long} + 0.005
        """
        return get_db_data(q, db_engine)

    @staticmethod
    def plot_device_context(db_engine, key_of_interest, audio_df, window_size,
                            display_ibm_data):
        """Adjacent recordings (+ optional IBM precip) around the clip."""
        import matplotlib.pyplot as plt

        center_time = audio_df.loc[key_of_interest]["time"]
        start_time = center_time - pd.Timedelta(days=window_size / 2)
        end_time = center_time + pd.Timedelta(days=window_size / 2)
        device_id = audio_df.loc[key_of_interest]["device_id"]
        window = audio_df[
            (audio_df["device_id"] == device_id)
            & (audio_df["time"].between(start_time, end_time))
        ]
        fig, ax = plt.subplots(figsize=(10, 3))
        ax.plot(window["time"], [device_id] * len(window), "o",
                label="Adjacent Audio Recordings", markersize=4)
        ax.plot([center_time], [device_id], "ro", label="Current Audio File")
        ax.set_title(f"Audio Context For {device_id}")
        ax.legend(fontsize=8)

        if display_ibm_data:
            lat = audio_df.loc[key_of_interest]["lat"]
            long = audio_df.loc[key_of_interest]["long"]
            if (lat == 0 and long == 0) or pd.isnull(lat) or pd.isnull(long):
                print("Could not get IBM data due to bad coordinates")
                plt.show()
                return
            try:
                ibm = TestVectorLabeler.fetch_ibm_data(
                    db_engine, start_time, end_time, lat, long
                )
            except Exception as e:
                print(f"Could not fetch IBM data: {e}")
                plt.show()
                return
            if ibm.empty:
                print(f"IBM data for {lat}, {long} not found in db")
                plt.show()
                return
            ax2 = ax.twinx()
            ax2.plot(ibm["time"], ibm["ibm_precip"], "-", color="tab:blue",
                     label="IBM precip")
            ax2.set_ylabel("IBM rain (mm)")
        plt.show()

    # ------------------------------------------------------------------
    def process_index(self, index: str, next_index_callback: Callable,
                      output_widget) -> None:
        from IPython.display import Audio, clear_output, display
        from ipywidgets import Button, HBox

        from audio_processing_tools_tpu.io.fetch import get_device_raw_audio_data
        from audio_processing_tools_tpu.viz.visualize_audio import (
            plot_audio_signal,
            plot_audio_spectrogram,
        )

        with output_widget:
            audio_file_data = self.audio_df.loc[index].copy()
            clear_output(wait=True)
            source_file = audio_file_data["source_file"]
            pos = self.index_list.get_loc(index) + 1
            print(f"File {pos} of {len(self.index_list)}")

            audio_data = get_device_raw_audio_data(
                keys=[source_file], local_cache_location=self.local_audio_cache,
                redownload=False, use_caching=True, header_only=False,
                verbose=False,
            )
            if source_file not in audio_data:
                raise KeyError(
                    f"Fetched audio data does not contain key {source_file!r}."
                )
            audio_binary = audio_data[source_file]
            sig, metadata = parse_mark_audio_file(audio_binary)
            sample_rate = metadata["sample_rate"]
            duration = len(sig) / sample_rate
            start_time, end_time = 0, min(duration, self.max_duration_seconds)
            audio_file_data["segment_start_seconds"] = start_time
            audio_file_data["segment_end_seconds"] = end_time
            print(f"Working on {source_file} from {start_time}s to {end_time}s")

            seg = sig[int(start_time * sample_rate) : int(end_time * sample_rate)]

            with self.audio_output:
                clear_output(wait=True)
                display(Audio(data=pcm_to_float(seg), rate=sample_rate,
                              normalize=self.normalize_audio,
                              autoplay=self.autoplay))

            buttons = {
                "Raining": self.make_button_handler(
                    audio_file_data, output_widget, True, next_index_callback
                ),
                "Not Raining": self.make_button_handler(
                    audio_file_data, output_widget, False, next_index_callback
                ),
                "Skip": lambda b: next_index_callback(),
                "Save for Review": self.make_save_for_review_handler(
                    audio_file_data, audio_binary, output_widget
                ),
                "Go Back": lambda b: self.process_previous_index(),
            }
            widgets = []
            for desc, handler in buttons.items():
                btn = Button(description=desc)
                btn.on_click(handler)
                widgets.append(btn)
            display(HBox(widgets))

            if self.visualize_time_series_signal:
                with self.signal_output:
                    clear_output(wait=True)
                    plot_audio_signal(pcm_to_float(seg), sample_rate,
                                      title=source_file)
            if self.visualize_signal_spectrogram:
                with self.spectrogram_output:
                    clear_output(wait=True)
                    plot_audio_spectrogram(pcm_to_float(seg), sample_rate)
            if self.visualize_device_context:
                with self.figure_output:
                    clear_output(wait=True)
                    self.plot_device_context(
                        self.db_engine, index, self.audio_df,
                        self.context_window_days, self.add_ibm_data,
                    )

    # ------------------------------------------------------------------
    def make_save_for_review_handler(self, audio_file_data, audio_binary,
                                     output_widget) -> Callable:
        def on_click(b):
            with output_widget:
                try:
                    self.save_file_for_review(audio_file_data, audio_binary,
                                              output_widget)
                except Exception as e:
                    print(f"Error while saving file for review: {e}")

        return on_click

    def make_button_handler(self, data, output_widget, rain_status: bool,
                            next_index_callback: Callable) -> Callable:
        def on_click(b):
            try:
                self.update_rain_label(data, rain_status, output_widget)
                time.sleep(0.5)
                next_index_callback()
            except Exception as e:
                print(f"Error in button handler: {e}")

        return on_click

    def update_rain_label(self, audio_file_data, rain_status: bool,
                          output_widget) -> None:
        """Build the label row and upsert it on a daemon thread
        (``labeler.py:358-414``)."""
        from IPython.display import display

        with output_widget:
            display(f"Rain label being updated to "
                    f"{'TRUE' if rain_status else 'FALSE'}...")
            now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
            row = pd.Series(dtype="object")
            row["source_file"] = audio_file_data["source_file"]
            row["device"] = audio_file_data["device_id"]
            row["start_time"] = audio_file_data["time"]
            row["segment_start_seconds"] = audio_file_data["segment_start_seconds"]
            row["segment_end_seconds"] = audio_file_data["segment_end_seconds"]
            row["site"] = None
            row["source"] = "manually labeled"
            row["raining"] = rain_status
            row["corrected"] = False
            try:
                import requests

                row["creator"] = requests.get(
                    "https://api.ipify.org", timeout=5
                ).content.decode("utf8")
            except Exception:
                row["creator"] = "unknown"
            row["update_time"] = now
            row["create_time"] = now
            row["manually_labeled"] = True
            uid = (
                str(row["source_file"])
                + str(row["segment_start_seconds"])
                + str(row["segment_end_seconds"])
            )
            row["uid"] = self.generate_uid(uid)
            data = pd.DataFrame([row]).set_index("uid")
            thread = threading.Thread(
                target=self.background_upsert, args=(data,), daemon=True
            )
            thread.start()
            self.upsert_threads.append(thread)

    def background_upsert(self, data: pd.DataFrame) -> None:
        from audio_processing_tools_tpu.io.db import upsert_df

        try:
            upsert_df(data, "device_audio_rain_classification",
                      self.db_engine_upsert)
            print("Database upsert completed successfully.")
        except Exception as e:
            print(f"Error during database upsert: {e}")

    def save_file_for_review(self, audio_file_data, audio_binary: bytes,
                             output_widget) -> None:
        """Export the decoded WAV for offline review (``labeler.py:416-445``)."""
        with output_widget:
            if self.out_folder is None:
                print("out_folder is not configured; cannot save file for review.")
                return
            source_file = str(audio_file_data["source_file"])
            device_id = str(audio_file_data.get("device_id", "unknown_device"))
            out_path = self.out_folder / f"{device_id}_{Path(source_file).stem}.wav"
            print(f"Saving decoded WAV for review to: {out_path}")
            sig, metadata = parse_mark_audio_file(audio_binary)
            write_wav(str(out_path), np.asarray(sig), int(metadata["sample_rate"]))
            if not out_path.exists():
                raise RuntimeError(f"WAV file was not created: {out_path}")
            print(
                f"Saved decoded WAV for review: {out_path} "
                f"({out_path.stat().st_size} bytes)"
            )
