package graft.warehouse

import org.apache.spark.sql.types._
import graft.ops.Relational.Bucket

/** Star-schema model: schemas, column contracts, and bucketing strategies
  * for the LFB warehouse (reference: etl/ jobs; see SURVEY §1, FIXTURES.md).
  * Strategy tables are data, not code — each bucketing job folds them into
  * one `when` chain (reference: aq-cleanse.py:47-120, weather-cleanse.py:23-114,
  * wb-cleanse.py:12-114).
  */
object Model {

  private def b(lo: Double, hi: Double, label: String): Bucket =
    Bucket(if (lo.isNegInfinity) None else Some(lo),
      if (hi.isPosInfinity) None else Some(hi), label)

  val inf: Double = Double.PositiveInfinity
  val ninf: Double = Double.NegativeInfinity

  // --- air quality (aq-cleanse.py:47-120) ---
  val aqSpecies = Seq("CO", "NO", "NO2", "NOX", "O3", "PM1", "PM10", "PM2.5")

  val aqStrategies: Seq[(String, Seq[Bucket])] = {
    def lvl(t1: Double, t2: Double, t3: Double, t4: Double) = Seq(
      b(0.0, t1, "Good"), b(t1, t2, "Moderate"), b(t2, t3, "Unhealthy for Sensitive"),
      b(t3, t4, "Unhealthy"), b(t4, inf, "Very Unhealthy"))
    Seq(
      "PM10" -> lvl(25, 50, 75, 100),
      "PM2_5" -> lvl(15, 25, 40, 65),
      "PM1" -> lvl(10, 20, 35, 50),
      "NO2" -> lvl(40, 80, 120, 200),
      "NO" -> lvl(50, 100, 200, 400),
      "NOX" -> lvl(100, 200, 300, 500),
      "O3" -> lvl(100, 120, 180, 240),
      "CO" -> lvl(10, 20, 30, 40))
  }

  // --- weather (weather-cleanse.py:23-114) ---
  val temperatureCategory = Seq(
    b(ninf, -10, "Very Cold"), b(-10, 0, "Cold"), b(0, 10, "Cool"), b(10, 20, "Mild"),
    b(20, 25, "Warm"), b(25, 30, "Hot"), b(30, inf, "Very Hot"))
  val temperatureAmplitude = Seq(
    b(0, 5, "Low"), b(5, 10, "Moderate"), b(10, 15, "High"), b(15, inf, "Very High"))
  val windDirection = Seq(
    b(337.5, 360, "North"), b(0, 22.5, "North"), b(22.5, 67.5, "Northeast"),
    b(67.5, 112.5, "East"), b(112.5, 157.5, "Southeast"), b(157.5, 202.5, "South"),
    b(202.5, 247.5, "Southwest"), b(247.5, 292.5, "West"), b(292.5, 337.5, "Northwest"))
  val windStrength = Seq(
    b(0, 1, "Calm"), b(1, 5, "Light Air"), b(5, 11, "Light Breeze"),
    b(11, 19, "Gentle Breeze"), b(19, 28, "Moderate Breeze"), b(28, 38, "Fresh Breeze"),
    b(38, 49, "Strong Breeze"), b(49, 61, "Moderate Gale"), b(61, 74, "Gale"),
    b(74, 88, "Severe Gale"), b(88, 102, "Storm"), b(102, 117, "Violent Storm"),
    b(117, inf, "Hurricane"))
  val precipitationLevel = Seq(
    b(0, 0.1, "None"), b(0.1, 2.5, "Light"), b(2.5, 10, "Moderate"),
    b(10, 25, "Heavy"), b(25, inf, "Very Heavy"))
  val snowLevel = Seq(
    b(0, 0.1, "None"), b(0.1, 5, "Light"), b(5, 15, "Moderate"),
    b(15, 30, "Heavy"), b(30, inf, "Very Heavy"))
  val windGustiness = Seq(
    b(0, 20, "Low"), b(20, 50, "Moderate"), b(50, 100, "High"), b(100, inf, "Very High"))
  val pressureLevel = Seq(
    b(ninf, 980, "Very Low"), b(980, 1000, "Low"), b(1000, 1020, "Normal"),
    b(1020, 1040, "High"), b(1040, inf, "Very High"))
  val sunshineLevel = Seq(
    b(0, 25200, "Very Short Day"), b(25200, 28800, "Short Day"),
    b(28800, 32400, "Normal Day"), b(32400, 36000, "Long Day"),
    b(36000, inf, "Very Long Day"))

  // --- well-being (wb-cleanse.py:12-114) ---
  private def five(t1: Double, t2: Double, t3: Double, t4: Double) = Seq(
    b(ninf, t1, "Very Low"), b(t1, t2, "Low"), b(t2, t3, "Medium"),
    b(t3, t4, "High"), b(t4, inf, "Very High"))

  val wbStrategies: Seq[(String, Seq[Bucket])] = Seq(
    "Life_Expectancy" -> five(78, 80, 82, 85),
    "Childhood_Obesity" -> five(12, 18, 24, 30),
    "Incapacity_Benefit" -> five(1.5, 3, 5, 8),
    "Unemployment" -> five(2, 5, 8, 12),
    "Crime" -> five(60, 90, 120, 180),
    "GCSE_points" -> five(310, 330, 350, 370),
    "Public_Transport_Access" -> five(1, 3, 5, 7),
    "Deliberate_Fires" -> (b(ninf, 0.1, "Extremely Low") +: Seq(
      b(0.1, 2, "Very Low"), b(2, 4, "Low"), b(4, 6, "Medium"),
      b(6, 8, "High"), b(8, inf, "Very High"))),
    "Unauthorised_Absence" -> five(0.6, 0.9, 1.2, 1.6),
    "Dependent_children" -> five(10, 17, 27, 40),
    "Homes_with_access" -> Seq(b(ninf, 0, "Below Average"), b(0, inf, "Above Average")))

  /** wb metric -> dimension column stem (wb-dimension.py:21-45). */
  val wbRename: Seq[(String, String)] = Seq(
    "Life_Expectancy" -> "LifeExpectancy", "Childhood_Obesity" -> "ChildhoodObesity",
    "Incapacity_Benefit" -> "IncapacityBenefit", "Unemployment" -> "Unemployment",
    "Crime" -> "Crime", "GCSE_points" -> "GcsePoints",
    "Public_Transport_Access" -> "PublicTransportAccess",
    "Deliberate_Fires" -> "DeliberateFires",
    "Unauthorised_Absence" -> "UnauthorisedAbsence",
    "Dependent_children" -> "DependentChildren", "Homes_with_access" -> "HomesWithAccess")

  // --- LFB cleanse contracts (lfb-cleanse.py:7-21) ---
  val lfbColumnsToDrop = Seq(
    "CalYear", "HourOfCall", "AddressQualifier", "Postcode_district", "UPRN",
    "IncGeo_BoroughName", "IncGeo_WardNameNew", "Easting_m", "Northing_m",
    "Easting_rounded", "Northing_rounded", "FRS", "PumpCount")

  /** Post-"NULL"-replacement re-typing (replaces the reference's CSV
    * round-trip re-inference, SURVEY §1.3): column -> target type.
    */
  val lfbRetype: Seq[(String, DataType)] = Seq(
    "USRN" -> LongType, "Latitude" -> DoubleType, "Longitude" -> DoubleType,
    "FirstPumpArriving_AttendanceTime" -> IntegerType,
    "SecondPumpArriving_AttendanceTime" -> IntegerType,
    "NumStationsWithPumpsAttending" -> IntegerType,
    "NumPumpsAttending" -> IntegerType, "PumpMinutesRounded" -> IntegerType,
    "Notional Cost (£)" -> IntegerType, "NumCalls" -> IntegerType)

  // --- fact (load_fact.py:32-96) ---
  val factStage1Columns = Seq(
    "IncidentNumber", "DateOfCall", "TimeOfCall", "IncidentGroup",
    "StopCodeDescription", "SpecialServiceType", "PropertyType", "IncGeo_WardCode",
    "IncGeo_WardName", "Latitude", "Longitude", "IncidentStationGround",
    "FirstPumpArriving_AttendanceTime", "FirstPumpArriving_DeployedFromStation",
    "SecondPumpArriving_AttendanceTime", "SecondPumpArriving_DeployedFromStation",
    "NumStationsWithPumpsAttending", "NumPumpsAttending", "PumpMinutesRounded",
    "Notional Cost (£)", "NumCalls")

  val bucketSizeSeconds = 43200L // ±12 h band (load_fact.py:30)

  val factSchema: StructType = StructType(Seq(
    StructField("DateOfCall", DateType, nullable = false),
    StructField("IncidentNumber", StringType, nullable = false),
    StructField("TimeOfCall", StringType, nullable = false),
    StructField("Latitude", DoubleType, nullable = true),
    StructField("Longitude", DoubleType, nullable = true),
    StructField("IncidentStationGround", StringType, nullable = false),
    StructField("FirstPumpAttendanceTime", IntegerType, nullable = true),
    StructField("FirstPumpStation", StringType, nullable = true),
    StructField("StationsWithPumpsAttending", IntegerType, nullable = false),
    StructField("PumpsAttending", IntegerType, nullable = false),
    StructField("PumpMinutes", IntegerType, nullable = false),
    StructField("NotionalCost", IntegerType, nullable = false),
    StructField("NumCalls", IntegerType, nullable = false),
    StructField("IncidentTypeKey", StringType, nullable = false),
    StructField("LocationTypeKey", StringType, nullable = false),
    StructField("WardID", StringType, nullable = false),
    StructField("AirQualityKey", StringType, nullable = false),
    StructField("WeatherKey", StringType, nullable = false),
    StructField("WellBeingID", StringType, nullable = false),
    StructField("CostPerCall", IntegerType, nullable = false)))

  val dateDimSchema: StructType = StructType(Seq(
    StructField("Date", DateType), StructField("Year", IntegerType),
    StructField("Month", IntegerType), StructField("Day", IntegerType),
    StructField("DayOfWeek", IntegerType), StructField("DayName", StringType),
    StructField("MonthName", StringType), StructField("Quarter", IntegerType),
    StructField("WeekOfYear", IntegerType), StructField("IsWeekend", BooleanType)))

  /** Weather dim output column order doubles as a positional rename
    * (load_weather_dim.py:24-38; SURVEY §1.3).
    */
  val weatherDimRename: Seq[(String, String)] = Seq(
    "TemperatureCategory" -> "TemperatureCategory", "WindDirection" -> "WindDirection",
    "WindStrength" -> "Wind", "PressureLevel" -> "Pressure",
    "PrecipitationLevel" -> "Precipitation", "SnowLevel" -> "Snow",
    "SunshineLevel" -> "Sunshine", "TemperatureAmplitude" -> "TemperatureAmplitude",
    "WindGustiness" -> "WindGustiness", "WeatherKey" -> "WeatherKey")

  val aqDimColumns = Seq("PM10Level", "PM2_5Level", "PM1Level", "NO2Level",
    "NOLevel", "NOXLevel", "O3Level", "COLevel", "AirQualityKey")
}
